package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSpec {

  test("saltedJoin is result-identical to the plain equi-join") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type")
    val users = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_total"))
    val plain = events.join(users, "user_id")
      .select("event_id", "user_id", "user_total")
    val salted = Skew.saltedJoin(events, users, "user_id",
        saltBy = col("event_id"), salts = 8)
      .select("event_id", "user_id", "user_total")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin replicates the small side across salt partitions") {
    import spark.implicits._
    val big = Seq.tabulate(100)(i => (i.toLong, 1L)).toDF("id", "k") // all same key
    val dim = Seq((1L, "x")).toDF("k", "v")
    val out = Skew.saltedJoin(big, dim, "k", saltBy = col("id"), salts = 4)
    assert(out.count() == 100)
    // salts spread the hot key: the join keys seen by the shuffle are (k, salt)
    val salts = big.withColumn("_salt", pmod(xxhash64(col("id")), lit(4)))
      .select("_salt").distinct().count()
    assert(salts > 1)
  }

  test("saltedJoin left outer keeps unmatched left rows exactly once") {
    import spark.implicits._
    val big = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "k")
    val dim = Seq((10L, "x")).toDF("k", "v")
    val out = Skew.saltedJoin(big, dim, "k", saltBy = col("id"),
      salts = 4, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter(col("id") === 3L && col("v").isNull).count() == 1)
  }

  test("saltedJoin left_semi/left_anti partition left rows") {
    import spark.implicits._
    val big = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "k")
    val dim = Seq((10L, "x")).toDF("k", "v")
    val semi = Skew.saltedJoin(big, dim, "k", saltBy = col("id"),
      salts = 4, joinType = "left_semi")
    val anti = Skew.saltedJoin(big, dim, "k", saltBy = col("id"),
      salts = 4, joinType = "left_anti")
    assert(semi.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(anti.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(semi.columns.toSeq == Seq("id", "k")) // left columns only
  }

  test("saltedJoin accepts Spark's bare semi/anti aliases") {
    import spark.implicits._
    val big = Seq((1L, 10L), (2L, 99L)).toDF("id", "k")
    val dim = Seq((10L, "x")).toDF("k", "v")
    assert(Skew.saltedJoin(big, dim, "k", saltBy = col("id"),
      joinType = "semi").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(Skew.saltedJoin(big, dim, "k", saltBy = col("id"),
      joinType = "anti").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("saltedJoin rejects right/full outer join types") {
    import spark.implicits._
    val big = Seq((1L, 10L)).toDF("id", "k")
    val dim = Seq((10L, "x")).toDF("k", "v")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, dim, "k", saltBy = col("id"), joinType = jt)
      }
    }
  }
}
