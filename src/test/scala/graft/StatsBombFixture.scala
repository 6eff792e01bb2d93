package graft

import java.nio.file.{Files, Path}

/** Deterministic StatsBomb-shaped JSON fixture for oracle-grading
  * [[graft.operators.StatsBombOps]] (reference: core/pedri_analysis.py
  * compute_stats_for_match, extended.py analyze_match_extended).
  *
  * Three matches, two teams, ~70 events, authored so every counter branch
  * of the StatsBomb surface fires at least once:
  *
  *  - pass: implicit-complete (no outcome), explicit "Complete",
  *    incomplete, cross, shot_assist / assisted_shot_id, goal_assist,
  *    under_pressure (on complete AND on incomplete), missing
  *    end_location (null-guard branches), switch (|dy| ≥ 40), into final
  *    third / penalty area, deep completion and its cross exclusion,
  *    basic and extended (30%-gain) progressive;
  *  - shot: xg present / ABSENT (coalesce), outcomes Goal/Saved/Off T,
  *    key_pass_id present / absent;
  *  - dribble Complete / Incomplete; duel Tackle / Aerial Lost;
  *  - carry: plain, progressive, missing end_location (distance 0.0);
  *  - pressures-after-loss: same-second tie, +5 s inclusive edge, +6 s
  *    exclusion, other-player exclusion, one pressure inside TWO loss
  *    windows (countDistinct);
  *  - substitution: off-only (on = kickoff), on+off (replacement path),
  *    MALFORMED duplicate off events (last-write-wins), plus a sub of an
  *    uninvolved player;
  *  - minutes: substitution path, < 10-minute span (clamp up),
  *    > 95-minute span (clamp down);
  *  - attack direction: per (team, match) inference from period-1
  *    completed passes — teams attack OPPOSITE ways in m1 vs m2, and
  *    period-2 events exercise the half-time flip;
  *  - Starting XI tactics.lineup arrays (two matches, three teams' worth);
  *  - heatmap: start locations incl. the (120, 80) upper-edge bin clamp.
  *
  * Every double that gets SUMmed is exactly representable (xg values are
  * binary fractions; carry segments are Pythagorean (3,4,5)/(5,12,13)/
  * (6,8,10) triples; coordinates are .25-grid decimals), so Spark and
  * DuckDB aggregate bit-identically in any order — the fixture needs no
  * DECIMAL-quantization tricks.
  */
object StatsBombFixture {

  private def idName(id: Long, name: String) = s"""{"id": $id, "name": "$name"}"""

  private val teams = Map(101L -> "Alpha FC", 102L -> "Beta United")
  private val players = Map(
    1001L -> "Alpha One", 1002L -> "Alpha Two", 1003L -> "Alpha Three",
    1004L -> "Alpha Four", 1005L -> "Alpha Five",
    2001L -> "Beta One", 2002L -> "Beta Two", 2003L -> "Beta Three")

  /** One event object. `extra` entries are pre-rendered `"key": {...}`
    * JSON members (pass/shot/carry/... structs, under_pressure flag). */
  private def ev(id: String, index: Int, period: Int, min: Int, sec: Int,
                 typ: String, team: Long, player: Long = -1L,
                 position: String = null, loc: (Double, Double) = null,
                 extra: Seq[String] = Nil): String = {
    val base = Seq(
      s""""id": "$id"""",
      s""""index": $index""",
      s""""period": $period""",
      s""""minute": $min""",
      s""""second": $sec""",
      s""""type": ${idName(typ.hashCode.toLong & 0xff, typ)}""",
      s""""team": ${idName(team, teams(team))}""")
    val opt = Seq(
      Option(player).filter(_ > 0).map(p => s""""player": ${idName(p, players(p))}"""),
      Option(position).map(p => s""""position": ${idName(p.hashCode.toLong & 0xff, p)}"""),
      Option(loc).map { case (x, y) => s""""location": [$x, $y]""" }).flatten
    (base ++ opt ++ extra).mkString("{", ", ", "}")
  }

  private def pass(end: (Double, Double) = null, recipient: Long = -1L,
                   outcome: String = null, cross: Boolean = false,
                   shotAssist: Boolean = false, goalAssist: Boolean = false,
                   assistedShotId: String = null): String = {
    val fields = Seq(
      Option(end).map { case (x, y) => s""""end_location": [$x, $y]""" },
      Option(recipient).filter(_ > 0)
        .map(r => s""""recipient": ${idName(r, players(r))}"""),
      Option(outcome).map(o => s""""outcome": ${idName(o.hashCode.toLong & 0xff, o)}"""),
      if (cross) Some(""""cross": true""") else None,
      if (shotAssist) Some(""""shot_assist": true""") else None,
      if (goalAssist) Some(""""goal_assist": true""") else None,
      Option(assistedShotId).map(a => s""""assisted_shot_id": "$a"""")).flatten
    s""""pass": ${fields.mkString("{", ", ", "}")}"""
  }

  private def shot(xg: Double = -1.0, outcome: String, keyPassId: String = null): String = {
    val fields = Seq(
      Option(xg).filter(_ >= 0).map(v => s""""statsbomb_xg": $v"""),
      Some(s""""outcome": ${idName(outcome.hashCode.toLong & 0xff, outcome)}"""),
      Option(keyPassId).map(k => s""""key_pass_id": "$k"""")).flatten
    s""""shot": ${fields.mkString("{", ", ", "}")}"""
  }

  private def carry(end: (Double, Double) = null): String =
    s""""carry": ${Option(end).map { case (x, y) => s"""{"end_location": [$x, $y]}""" }.getOrElse("{}")}"""

  private def dribble(outcome: String): String =
    s""""dribble": {"outcome": ${idName(outcome.hashCode.toLong & 0xff, outcome)}}"""

  private def duel(typ: String): String =
    s""""duel": {"type": ${idName(typ.hashCode.toLong & 0xff, typ)}}"""

  private def substitution(replacement: Long): String =
    s""""substitution": {"replacement": ${idName(replacement, players(replacement))}}"""

  private def tactics(formation: Long, lineup: (Long, String)*): String = {
    val entries = lineup.map { case (p, pos) =>
      s"""{"player": ${idName(p, players(p))}, "position": ${idName(pos.hashCode.toLong & 0xff, pos)}}"""
    }
    s""""tactics": {"formation": $formation, "lineup": ${entries.mkString("[", ", ", "]")}}"""
  }

  private val underPressure = """"under_pressure": true"""

  private val CM = "Center Midfield"
  private val RM = "Right Midfield"
  private val RW = "Right Wing"
  private val LW = "Left Wing"
  private val LB = "Left Back"
  private val GK = "Goalkeeper"

  /** Match 1: team 101 attacks right in period 1, team 102 left. */
  val m1: Seq[String] = Seq(
    ev("s1", 1, 1, 0, 0, "Starting XI", 101L,
      extra = Seq(tactics(433, 1001L -> CM, 1002L -> RW))),
    ev("s2", 2, 1, 0, 0, "Starting XI", 102L,
      extra = Seq(tactics(442, 2001L -> LB, 2002L -> GK))),
    // 2001's first event — with b3 below it spans > 95 min (clamp down)
    ev("b1", 3, 1, 2, 0, "Ball Recovery", 102L, 2001L, LB, (50.0, 40.0)),
    // implicit-complete pass; basic-progressive (dx 15 > |dy| 2) but NOT
    // extended-progressive (gain 15 < 0.3 * 90)
    ev("e10", 4, 1, 5, 0, "Pass", 101L, 1001L, CM, (30.0, 40.0),
      Seq(pass(end = (45.0, 38.0), recipient = 1002L))),
    // explicit "Complete" outcome; extended-progressive; final third;
    // completed under pressure
    ev("e11", 5, 1, 6, 0, "Pass", 101L, 1001L, CM, (50.0, 40.0),
      Seq(pass(end = (85.0, 44.0), recipient = 1002L, outcome = "Complete"),
        underPressure)),
    // incomplete under pressure (must NOT count as passes_under_pressure)
    ev("e12", 6, 1, 7, 0, "Pass", 101L, 1001L, CM, (60.0, 20.0),
      Seq(pass(end = (90.0, 25.0), outcome = "Incomplete"), underPressure)),
    // cross into the penalty area: deep-completion EXCLUDED (cross), pen
    // area counted, shot_assist -> key pass, assists shot e20
    ev("e13", 7, 1, 8, 0, "Pass", 101L, 1001L, CM, (100.0, 70.0),
      Seq(pass(end = (110.0, 40.0), recipient = 1002L, cross = true,
        shotAssist = true, assistedShotId = "e20"))),
    // switch of play (|dy| 65), not progressive either way
    ev("e14", 8, 1, 9, 0, "Pass", 101L, 1001L, RM, (40.0, 10.0),
      Seq(pass(end = (55.0, 75.0), recipient = 1002L))),
    // deep completion (non-cross), pen area, goal_assist, assists e21
    ev("e15", 9, 1, 10, 0, "Pass", 101L, 1001L, CM, (95.0, 40.0),
      Seq(pass(end = (105.0, 45.0), recipient = 1002L, goalAssist = true,
        assistedShotId = "e21"))),
    // completed pass with NO end_location and NO recipient (null guards)
    ev("e16", 10, 1, 11, 0, "Pass", 101L, 1001L, CM, (55.0, 35.0),
      Seq(pass())),
    // completed pass with NO start location: excluded from heatmap and
    // from every x-guarded predicate, but passes_into_final_third only
    // tests x2 — it still counts (matching the reference's per-counter
    // guard granularity)
    ev("e17", 44, 1, 11, 30, "Pass", 101L, 1001L, CM,
      extra = Seq(pass(end = (85.0, 50.0), recipient = 1002L))),
    ev("e20", 11, 1, 8, 30, "Shot", 101L, 1001L, CM, (108.0, 42.0),
      Seq(shot(xg = 0.25, outcome = "Saved", keyPassId = "e13"))),
    ev("e21", 12, 1, 10, 30, "Shot", 101L, 1002L, RW, (110.0, 38.0),
      Seq(shot(xg = 0.5, outcome = "Goal", keyPassId = "e15"))),
    ev("e22", 13, 1, 12, 0, "Shot", 101L, 1001L, CM, (100.0, 40.0),
      Seq(shot(xg = 0.125, outcome = "Off T"))),
    ev("e23", 14, 1, 13, 0, "Dribble", 101L, 1001L, CM, (70.0, 30.0),
      Seq(dribble("Complete"))),
    ev("e24", 15, 1, 14, 0, "Dribble", 101L, 1001L, CM, (72.0, 31.0),
      Seq(dribble("Incomplete"))),
    // carries: (3,4,5) plain, (12,5,13) progressive, missing end -> 0.0
    ev("e25", 16, 1, 15, 0, "Carry", 101L, 1001L, CM, (60.0, 40.0),
      Seq(carry(end = (63.0, 44.0)))),
    ev("e26", 17, 1, 16, 0, "Carry", 101L, 1001L, CM, (50.0, 30.0),
      Seq(carry(end = (62.0, 35.0)))),
    ev("e27", 18, 1, 17, 0, "Carry", 101L, 1001L, CM, (55.0, 45.0),
      Seq(carry())),
    // pressures-after-loss cluster: losses at t=1210 and t=1212
    ev("l1", 19, 1, 20, 10, "Miscontrol", 101L, 1001L, CM, (40.0, 40.0)),
    ev("l2", 20, 1, 20, 12, "Dispossessed", 101L, 1001L, CM, (41.0, 40.0)),
    ev("pr1", 21, 1, 20, 10, "Pressure", 101L, 1001L, CM, (42.0, 40.0)), // tie
    ev("pr2", 22, 1, 20, 15, "Pressure", 101L, 1001L, CM, (43.0, 41.0)), // in BOTH windows
    ev("pr3", 23, 1, 20, 18, "Pressure", 101L, 1001L, CM, (44.0, 41.0)), // outside both
    ev("pr4", 24, 1, 20, 11, "Pressure", 101L, 1002L, RW, (45.0, 42.0)), // other player
    ev("l3", 25, 1, 25, 0, "Dispossessed", 101L, 1001L, CM, (60.0, 50.0)),
    ev("pr5", 26, 1, 25, 3, "Pressure", 101L, 1001L, CM, (61.0, 50.0)), // +3 s
    ev("i1", 27, 1, 27, 0, "Interception", 101L, 1001L, CM, (50.0, 50.0)),
    ev("b2", 28, 1, 28, 0, "Ball Recovery", 101L, 1001L, CM, (52.0, 50.0)),
    ev("d1", 29, 1, 29, 0, "Duel", 101L, 1001L, CM, (55.0, 50.0),
      Seq(duel("Tackle"))),
    ev("d2", 30, 1, 30, 0, "Duel", 101L, 1001L, CM, (56.0, 50.0),
      Seq(duel("Aerial Lost"))),
    // Duel with NO type struct at all (null duel_type — not a tackle)
    ev("d3", 45, 1, 31, 0, "Duel", 101L, 1001L, CM, (57.0, 50.0)),
    // extra time (period 3): odd parity flips BACK to the first-half
    // direction — team 101 attacks right again, so this is progressive
    // on unflipped coordinates
    ev("e60", 46, 3, 95, 0, "Pass", 101L, 1001L, CM, (30.0, 40.0),
      Seq(pass(end = (65.0, 42.0), recipient = 1002L))),
    // team 102 attacks LEFT in p1 (completed dx majority negative)
    ev("e50", 31, 1, 18, 0, "Pass", 102L, 2001L, LB, (90.0, 40.0),
      Seq(pass(end = (70.0, 42.0), recipient = 2002L))),
    ev("e51", 32, 1, 19, 0, "Pass", 102L, 2001L, LB, (80.0, 30.0),
      Seq(pass(end = (50.0, 35.0), recipient = 2002L))),
    ev("e52", 33, 1, 21, 0, "Pass", 102L, 2001L, LB, (60.0, 60.0),
      Seq(pass(end = (58.0, 62.0), recipient = 2002L))),
    ev("e53", 34, 1, 22, 0, "Pass", 102L, 2001L, LB, (30.0, 40.0),
      Seq(pass(end = (60.0, 45.0), outcome = "Incomplete"))),
    ev("sh1", 35, 1, 23, 0, "Shot", 102L, 2001L, LB, (20.0, 40.0),
      Seq(shot(xg = 0.0625, outcome = "Saved"))),
    // shot with ABSENT xg (team_total_xg coalesce branch)
    ev("sh2", 36, 1, 24, 0, "Shot", 102L, 2002L, GK, (15.0, 38.0),
      Seq(shot(outcome = "Blocked"))),
    // period 2: team 101 now attacks LEFT (flip); extended-progressive
    // on ADJUSTED coords, received by 1002 in p2
    ev("e40", 37, 2, 50, 0, "Pass", 101L, 1001L, CM, (90.0, 50.0),
      Seq(pass(end = (60.0, 42.0), recipient = 1002L))),
    // adjusted (70,40)->(90,44): final third + extended-progressive
    ev("e41", 38, 2, 52, 0, "Pass", 101L, 1001L, CM, (50.0, 40.0),
      Seq(pass(end = (30.0, 36.0), recipient = 1002L))),
    // adjusted dx 8 (not progressive); distance (6,8,10)
    ev("c40", 39, 2, 54, 0, "Carry", 101L, 1001L, CM, (70.0, 40.0),
      Seq(carry(end = (62.0, 34.0)))),
    // MALFORMED duplicate substitutions of 1001 — last-write-wins (max)
    ev("sub1", 40, 2, 75, 0, "Substitution", 101L, 1001L, CM,
      extra = Seq(substitution(1003L))),
    ev("sub2", 41, 2, 80, 0, "Substitution", 101L, 1001L, CM,
      extra = Seq(substitution(1004L))),
    ev("sub3", 42, 2, 60, 0, "Substitution", 102L, 2002L, GK,
      extra = Seq(substitution(2003L))),
    ev("b3", 43, 2, 100, 0, "Ball Recovery", 102L, 2001L, LB, (30.0, 30.0)))

  /** Match 2: directions SWAPPED — team 101 attacks left in p1, 102
    * right. 1001 comes ON as a replacement then goes off (on+off minutes
    * path); xA credit flows to a different passer (1002). */
  val m2: Seq[String] = Seq(
    ev("m2s1", 1, 1, 0, 0, "Starting XI", 101L,
      extra = Seq(tactics(433, 1001L -> CM, 1003L -> LB))),
    ev("m2s2", 2, 1, 0, 0, "Starting XI", 102L,
      extra = Seq(tactics(352, 2001L -> LB))),
    // team 101 completed p1 passes: dx -20, -25, +12 -> attacks left
    ev("f10", 3, 1, 3, 0, "Pass", 101L, 1001L, CM, (70.0, 40.0),
      Seq(pass(end = (50.0, 38.0), recipient = 1002L))),
    ev("f11", 4, 1, 6, 0, "Pass", 101L, 1001L, RM, (65.0, 30.0),
      Seq(pass(end = (40.0, 36.0), recipient = 1002L))),
    // 1002's assist pass: basic-progressive on RAW coords (dx 12 > |dy| 4)
    ev("f12", 5, 1, 9, 0, "Pass", 101L, 1002L, RW, (30.0, 40.0),
      Seq(pass(end = (42.0, 44.0), recipient = 1001L, shotAssist = true,
        assistedShotId = "f20"))),
    ev("f20", 6, 1, 10, 0, "Shot", 101L, 1001L, CM, (105.0, 40.0),
      Seq(shot(xg = 0.75, outcome = "Goal", keyPassId = "f12"))),
    // 1002's positions across matches: RW twice, LW twice (rank tie)
    ev("f13", 7, 1, 11, 0, "Dribble", 101L, 1002L, LW, (50.0, 20.0),
      Seq(dribble("Complete"))),
    ev("f14", 8, 1, 12, 0, "Dribble", 101L, 1002L, LW, (52.0, 22.0),
      Seq(dribble("Incomplete"))),
    // team 102 completed p1 passes: +25, +20, -20 -> attacks right
    ev("g10", 9, 1, 4, 0, "Pass", 102L, 2001L, LB, (30.0, 40.0),
      Seq(pass(end = (55.0, 42.0), recipient = 2002L))),
    ev("g11", 10, 1, 5, 0, "Pass", 102L, 2001L, LB, (40.0, 50.0),
      Seq(pass(end = (60.0, 48.0), recipient = 2002L))),
    // upper-edge heatmap start (120, 80) -> bin (47, 31)
    ev("g12", 11, 1, 7, 0, "Pass", 102L, 2002L, GK, (120.0, 80.0),
      Seq(pass(end = (100.0, 60.0), recipient = 2001L))),
    // 1001 replaced 1003 at 60:00, went off at 85:00 -> 25.0 minutes
    ev("m2sub1", 12, 2, 60, 0, "Substitution", 101L, 1003L, LB,
      extra = Seq(substitution(1001L))),
    ev("m2sub2", 13, 2, 85, 0, "Substitution", 101L, 1001L, CM,
      extra = Seq(substitution(1005L))))

  /** Match 3: no substitutions, 4-minute event span (clamp up to 10);
    * absent from the profile (all meta defaults). */
  val m3: Seq[String] = Seq(
    ev("h1", 1, 1, 1, 0, "Pass", 101L, 1001L, CM, (10.0, 10.0),
      Seq(pass(end = (20.0, 12.0), recipient = 1002L))),
    ev("h2", 2, 1, 5, 0, "Ball Recovery", 101L, 1001L, CM, (30.0, 20.0)))

  /** Profile JSON (reference extended.py:40-58): m1 keyed by `match_id`
    * with full fields; m2 keyed by the alternate `id` key with FALSY
    * minutes/position (the reference's `or`-defaults kick in); m3 absent
    * entirely (left-join defaults). */
  val profile: String =
    """[
      |  {"match_id": "m1", "team_name": "Alpha FC", "minutes": 81.5, "position": "Center Midfield"},
      |  {"id": "m2", "team": "Alpha FC", "minutes": 0.0, "position": ""}
      |]""".stripMargin

  /** Write the three event files + profile under `dir`; returns the
    * events glob and the profile path. */
  def write(dir: Path): (String, String) = {
    val events = dir.resolve("events")
    Files.createDirectories(events)
    def dump(name: String, evs: Seq[String]): Unit =
      Files.writeString(events.resolve(name), evs.mkString("[\n", ",\n", "\n]"))
    dump("m1.json", m1)
    dump("m2.json", m2)
    dump("m3.json", m3)
    val profilePath = dir.resolve("profile.json")
    Files.writeString(profilePath, profile)
    (events.toString, profilePath.toString)
  }
}
