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
}
