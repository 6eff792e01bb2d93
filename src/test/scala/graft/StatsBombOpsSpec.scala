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
    Files.writeString(new java.io.File(dir, "m1.json").toPath, m1)
    Files.writeString(new java.io.File(dir, "m2.json").toPath, m2)
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
