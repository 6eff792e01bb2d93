package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.{EventOps, StatsOps}
import graft.sources.{Sinks, Tables}

/** Write-side layout + approximate-aggregate scale paths. */
class SinksSpec extends SparkSpec {

  test("day-partitioned layout prunes partitions on read") {
    val out = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    val events = Tables.events(spark, sfDir)
    Sinks.writePartitionedByDay(events, out)
    val back = Sinks.readPartitioned(spark, out)
    assert(back.count() == events.count())
    val pruned = back.filter(col("day") === "2024-01-05")
    val p = pruned.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters"), p)
    assert(p.linesIterator.find(_.contains("PartitionFilters")).get
      .contains("day"), p)
    // partition column filter never becomes a data filter
    assert(pruned.count() ==
      events.filter(to_date(col("ts")) === "2024-01-05").count())
  }

  test("summaryApprox: single pass, no Expand, within HLL error of exact") {
    val events = Tables.events(spark, sfDir)
    val approx = EventOps.summaryApprox(events)
    val p = approx.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Expand"), p) // exact countDistinct would Expand
    val row = approx.collect().head
    val exactUsers = events.select("user_id").distinct().count()
    val gotUsers = row.getAs[Long]("n_users_approx")
    assert(math.abs(gotUsers - exactUsers).toDouble / exactUsers < 0.1,
      s"approx $gotUsers vs exact $exactUsers")
  }

  test("percentileApprox quantiles are ordered and bracket the median") {
    val events = Tables.events(spark, sfDir)
    val r = StatsOps.percentileApprox(events).collect().head
    val qs = r.getSeq[Double](0)
    assert(qs.length == 3)
    assert(qs(0) <= qs(1) && qs(1) <= qs(2))
    assert(qs(0) > 0.0)
  }
}
