package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.StatsBombOps
import graft.sources.EventsJsonSource

/** End-to-end reference-pipeline semantics over StatsBomb-shaped JSON. */
class StatsBombOpsSpec extends SparkSpec {

  private lazy val flat = {
    val dir = Files.createTempDirectory("graft_sb").toFile
    // two "matches"; player 30486 passes, assists, gets subbed off in m2
    val m1 =
      """[
        |{"id":"p1","index":1,"period":1,"minute":1,"second":0,
        | "type":{"id":30,"name":"Pass"},"player":{"id":30486,"name":"P"},
        | "team":{"id":1,"name":"T"},"position":{"id":15,"name":"LCM"},
        | "location":[40.0,40.0],
        | "pass":{"end_location":[60.0,42.0],"recipient":{"id":7,"name":"R"}}},
        |{"id":"p2","index":2,"period":1,"minute":2,"second":0,
        | "type":{"id":30,"name":"Pass"},"player":{"id":30486,"name":"P"},
        | "team":{"id":1,"name":"T"},"position":{"id":15,"name":"LCM"},
        | "location":[60.0,40.0],
        | "pass":{"end_location":[62.0,41.0],"outcome":{"id":9,"name":"Incomplete"}}},
        |{"id":"s1","index":3,"period":2,"minute":80,"second":0,
        | "type":{"id":16,"name":"Shot"},"player":{"id":7,"name":"R"},
        | "team":{"id":1,"name":"T"},"location":[110.0,40.0],
        | "shot":{"statsbomb_xg":0.4,"key_pass_id":"p1"}},
        |{"id":"e1","index":4,"period":2,"minute":93,"second":0,
        | "type":{"id":34,"name":"Half End"},"player":{"id":7,"name":"R"},
        | "team":{"id":1,"name":"T"}}
        |]""".stripMargin
    val m2 =
      """[
        |{"id":"q1","index":1,"period":1,"minute":0,"second":30,
        | "type":{"id":30,"name":"Pass"},"player":{"id":30486,"name":"P"},
        | "team":{"id":1,"name":"T"},"position":{"id":13,"name":"RCM"},
        | "location":[30.0,30.0],"pass":{"end_location":[45.0,31.0]}},
        |{"id":"q2","index":2,"period":2,"minute":60,"second":0,
        | "type":{"id":19,"name":"Substitution"},"player":{"id":30486,"name":"P"},
        | "team":{"id":1,"name":"T"},
        | "substitution":{"replacement":{"id":99,"name":"X"}}},
        |{"id":"q3","index":3,"period":2,"minute":92,"second":0,
        | "type":{"id":34,"name":"Half End"},"player":{"id":7,"name":"R"},
        | "team":{"id":1,"name":"T"}}
        |]""".stripMargin
    // player 555 exercises the defensive/ball-carrying counters —
    // reference core/pedri_analysis.py:96-121 + extended.py:286-287
    val m3 =
      """[
        |{"id":"d1","index":1,"period":1,"minute":5,"second":0,
        | "type":{"id":14,"name":"Dribble"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[50.0,20.0],
        | "dribble":{"outcome":{"id":8,"name":"Complete"}}},
        |{"id":"d2","index":2,"period":1,"minute":6,"second":0,
        | "type":{"id":14,"name":"Dribble"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[52.0,22.0],
        | "dribble":{"outcome":{"id":9,"name":"Incomplete"}}},
        |{"id":"c1","index":3,"period":1,"minute":7,"second":0,
        | "type":{"id":43,"name":"Carry"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[10.0,10.0],
        | "carry":{"end_location":[13.0,14.0]}},
        |{"id":"c2","index":4,"period":1,"minute":8,"second":0,
        | "type":{"id":43,"name":"Carry"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[20.0,20.0]},
        |{"id":"t1","index":5,"period":1,"minute":9,"second":0,
        | "type":{"id":4,"name":"Duel"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[30.0,30.0],
        | "duel":{"type":{"id":11,"name":"Tackle"}}},
        |{"id":"t2","index":6,"period":1,"minute":10,"second":0,
        | "type":{"id":4,"name":"Duel"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[31.0,31.0],
        | "duel":{"type":{"id":10,"name":"Aerial Lost"}}},
        |{"id":"i1","index":7,"period":1,"minute":11,"second":0,
        | "type":{"id":10,"name":"Interception"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[40.0,40.0]},
        |{"id":"u1","index":8,"period":1,"minute":12,"second":0,
        | "type":{"id":30,"name":"Pass"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[45.0,40.0],"under_pressure":true,
        | "pass":{"end_location":[50.0,41.0]}},
        |{"id":"u2","index":9,"period":1,"minute":13,"second":0,
        | "type":{"id":30,"name":"Pass"},"player":{"id":555,"name":"D"},
        | "team":{"id":2,"name":"U"},"location":[50.0,40.0],
        | "pass":{"end_location":[55.0,41.0],"outcome":{"id":8,"name":"Complete"}}}
        |]""".stripMargin
    Files.writeString(new java.io.File(dir, "m1.json").toPath, m1)
    Files.writeString(new java.io.File(dir, "m2.json").toPath, m2)
    Files.writeString(new java.io.File(dir, "m3.json").toPath, m3)
    EventsJsonSource.flatten(
      EventsJsonSource.read(spark, dir.getAbsolutePath)).cache()
  }

  test("matchStats reproduces the reference per-match counters") {
    val stats = StatsBombOps.matchStats(flat)
      .filter(col("player_id") === 30486L)
      .collect().map(r => r.getAs[String]("match_file") -> r).toMap
    val m1 = stats.keys.find(_.contains("m1.json")).map(stats).get
    assert(m1.getAs[Long]("total_pass") == 2)
    assert(m1.getAs[Long]("comp_pass") == 1) // p2 has an outcome → incomplete
    assert(m1.getAs[Long]("key_passes") == 0) // shot_assist flag unset in the JSON; credit flows via xA
    assert(m1.getAs[Long]("prog_pass") == 1) // p1: dx=20 > dy=2, >= 10
    assert(m1.getAs[Double]("pass_pct") == 50.0)
  }

  test("matchStats covers the defensive and ball-carrying counters") {
    val s = StatsBombOps.matchStats(flat)
      .filter(col("player_id") === 555L).head()
    assert(s.getAs[Long]("dribbles_attempted") == 2)
    assert(s.getAs[Long]("dribbles_completed") == 1) // only outcome "Complete"
    assert(s.getAs[Long]("carries") == 2)
    // c1 moves (10,10)→(13,14) = 5.0; c2 has no end_location → 0.0
    assert(s.getAs[Double]("carry_distance_units") == 5.0)
    assert(s.getAs[Long]("tackles") == 1) // the Aerial Lost duel is not a tackle
    assert(s.getAs[Long]("interceptions") == 1)
    assert(s.getAs[Long]("passes_under_pressure") == 1)
    // an explicit "Complete" outcome counts as completed (reference :85-90)
    assert(s.getAs[Long]("total_pass") == 2 && s.getAs[Long]("comp_pass") == 2)
  }

  test("minutesPlayed honors the substitution window") {
    val mins = StatsBombOps.minutesPlayed(flat, 30486L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val m1 = mins.keys.find(_.contains("m1.json")).map(mins).get
    val m2 = mins.keys.find(_.contains("m2.json")).map(mins).get
    assert(m1 == 92.0) // first event min 1 → last match event min 93
    assert(m2 == 59.5) // first event 0:30 → subbed off at 60:00
  }

  test("xA credits the passer with the shot's xG") {
    val xa = StatsBombOps.xA(flat).collect()
    assert(xa.length == 1)
    assert(xa.head.getAs[Long]("player_id") == 30486L)
    assert(xa.head.getAs[Double]("xa") == 0.4)
  }

  test("withAttackDirection flips the pitch for left-attacking halves") {
    val adjusted = StatsBombOps.withAttackDirection(flat)
    // m1: first-half completed pass p1 goes +x → attacks right in p1,
    // so p1's coordinates are unchanged...
    val p1 = adjusted.filter(col("event_id") === "p1").head()
    assert(p1.getAs[Double]("x") == 40.0 && p1.getAs[Double]("x2") == 60.0)
    assert(p1.getAs[Boolean]("attacks_right"))
    // ...and the second-half shot s1 is flipped (team swaps ends)
    val s1 = adjusted.filter(col("event_id") === "s1").head()
    assert(!s1.getAs[Boolean]("attacks_right"))
    assert(s1.getAs[Double]("x") == 10.0) // 120 - 110
    assert(s1.getAs[Double]("y") == 40.0) // 80 - 40
  }

  test("positionFrequency ranks positions per player") {
    val top = StatsBombOps.positionFrequency(flat)
      .filter(col("player_id") === 30486L && col("rank") === 1).collect()
    assert(top.length == 1)
    assert(top.head.getAs[String]("position") == "LCM") // 1 LCM+... ties broken alphabetically
  }
}
