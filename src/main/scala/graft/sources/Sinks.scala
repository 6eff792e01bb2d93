package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-layout helpers — the write side of the 100 TB contract.
  *
  * The reference pipeline writes per-match CSVs from a driver loop; at
  * scale the equivalents are (a) a date-partitioned columnar layout that
  * later scans can partition-prune, and (b) bucketed fact tables
  * ([[Tables.writeBucketed]]) that later joins need not shuffle.
  */
object Sinks {

  /** THE day-partition derivation — single definition shared by the batch
    * sink and `EventStream.writePartitionedStream`, so the two estates
    * can never silently write incompatible `day=` layouts. */
  def withDay(events: DataFrame): DataFrame =
    events.withColumn("day", to_date(col("ts")))

  /** Write events partitioned by day: `path/day=YYYY-MM-DD/part-*.parquet`.
    *
    * Day is derived once at write time; readers filtering on `day` prune
    * whole directories before any IO (PartitionFilters, asserted in
    * `SinksSpec`). `maxRecordsPerFile` bounds file sizes so a hot day
    * still splits across executors. */
  def writePartitionedByDay(events: DataFrame, path: String,
                            maxRecordsPerFile: Long = 5000000L): Unit =
    withDay(events)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("day")
      .parquet(path)

  /** Read back a day-partitioned event layout. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The IVF index layout: embeddings partitioned by list id —
    * `path/label=N/part-*.parquet`. An `AnnOps.annIvf` probe over this
    * layout reads only the probed lists' directories: the probe set is
    * a broadcast joined on the partition column, so dynamic partition
    * pruning turns "scan the corpus" into "scan nProbe/nLists of it"
    * (PartitionFilters carries the dynamicpruning subquery — asserted in
    * `SinksSpec`). This is the §2-60 claim made physical. */
  def writePartitionedByLabel(embeddings: DataFrame, path: String,
                              maxRecordsPerFile: Long = 5000000L): Unit =
    writePartitionedBy(embeddings, path, "label", maxRecordsPerFile)

  /** The general list-keyed index layout — `path/<col>=N/part-*.parquet`.
    * [[writePartitionedByLabel]] is this on the raw embeddings' label;
    * the IVF-PQ code table writes through it on the LEARNED `list_id`
    * (`AnnOps.pqIvfIndex`), so a `pqSearchIvfIndex` probe
    * dynamic-partition-prunes the code directories the same way
    * (asserted in `SinksSpec`). */
  def writePartitionedBy(df: DataFrame, path: String, partitionCol: String,
                         maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Compact a flat parquet directory's small files into
    * ⌈totalBytes / targetFileBytes⌉ right-sized ones, written to
    * `outPath` (write-to-new-then-swap is the atomic deployment move —
    * never rewrite a layout in place while readers hold its file list).
    *
    * Small files are the silent 100 TB killer: a streaming sink or a
    * 1000-task job writing a 128 MB-row-group format in 200 KB pieces
    * turns every later scan into metadata chatter (one footer read +
    * seek per file, open-file caps on the NameNode/object store). One
    * shuffle, sized by actual BYTES (from the filesystem, not a row
    * guess), restores scan-sized files. Returns the target file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    requireDistinctPaths(spark, inPath, outPath)
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
    spark.read.parquet(inPath)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Partition-preserving compaction for a `col=value` layout: shuffle
    * on the partition column so each partition's rows land in one task
    * → ONE data file per partition directory (bounded above by
    * `maxRecordsPerFile` when a partition is hot, so a skewed day still
    * splits rather than producing one monster file). The layout contract
    * (pruning via PartitionFilters) is unchanged — only the file count
    * inside each directory drops. */
  def compactPartitioned(spark: SparkSession, inPath: String,
                         outPath: String, partitionCol: String,
                         maxRecordsPerFile: Long = 5000000L): Unit = {
    requireDistinctPaths(spark, inPath, outPath)
    spark.read.parquet(inPath)
      .repartition(col(partitionCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(outPath)
  }

  /** Write a frame as a GLOBALLY ordered parquet layout without a global
    * sort: `repartitionByRange(orderCol)` range-partitions rows (sampled
    * split points, one shuffle), `sortWithinPartitions` orders each part
    * locally, and zero-padded part file numbering makes lexicographic
    * file order = global row order. This is the scale consumer of
    * [[graft.operators.CorpusOps.epochOrder]]'s `pos`: a trainer reads
    * part files in name order and sees the exact epoch ordering, yet no
    * single task ever held more than one range (the `orderBy` in the
    * query itself is only the harness's deterministic-output contract).
    * `nFiles` sizes the ranges (a 100 TB epoch wants thousands). */
  def writeOrdered(df: DataFrame, path: String, orderCol: String,
                   nFiles: Int = 32): Unit =
    df.repartitionByRange(nFiles, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite").parquet(path)

  /** Z-ORDERED layout write (round 20) — multi-dimensional data
    * skipping from open Spark primitives, the `OPTIMIZE ZORDER BY`
    * shape without a table format: a single-key range sort
    * ([[writeOrdered]]) makes ONE column's file-level min/max tight and
    * leaves every other column's span at ~100% per file, so predicates
    * on the second dimension prune nothing. Interleaving the bits of
    * the two columns' EQUI-DEPTH bucket ranks (approxQuantile
    * boundaries → bucket index → bit-interleave, all pure Column
    * expressions over a broadcast literal array) gives a space-filling
    * curve key: range-partitioning + sorting by it tiles the
    * (c1 × c2) plane, so EVERY file carries a tight min/max box on
    * BOTH original columns and parquet row-group/file stats prune
    * queries on EITHER dimension — at 100 TB, the difference between
    * reading one tile row of files and scanning the corpus for the
    * second-dimension predicate.
    *
    * Cost, stated honestly: two driver-side approxQuantile jobs over
    * the two key columns (equi-depth ranks keep skewed data tiling —
    * uniform-width buckets would collapse under skew) + the one hash
    * shuffle every clustered write pays. The z key is dropped before the
    * bytes land — the layout IS the index. Numeric key columns only
    * (cast upstream). `nFiles` must be a power of two: each output file
    * is exactly one z-curve tile (one aligned prefix of the curve). */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    nFiles: Int = 32, bits: Int = 10): Unit = {
    require(nFiles > 0 && (nFiles & (nFiles - 1)) == 0 &&
      nFiles <= (1 << (2 * bits)),
      s"nFiles must be a power of two <= 4^bits, got $nFiles")
    val probes = (0 to (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // Equi-depth boundaries; approxQuantile returns them sorted.
    // Duplicate boundaries are kept DELIBERATELY: the rank below counts
    // every boundary <= value, so a value sitting on a repeated quantile
    // still lands at rank ~ floor(cdf * 2^bits) — collapsing duplicates
    // (an earlier draft did) compresses the rank range below 2^bits and
    // the bit-interleave then no longer halves the mass per bit, which
    // skews the whole curve.
    val b1 = df.stat.approxQuantile(c1, probes, 0.001)
    val b2 = df.stat.approxQuantile(c2, probes, 0.001)
    def bucket(c: String, bounds: Array[Double]) = {
      // rank of the value among the interior boundaries — a codegen'd
      // HOF over a literal array (the boundaries are KB-scale, they
      // ride the plan)
      val arr = array(bounds.drop(1).dropRight(1).map(lit): _*)
      aggregate(arr, lit(0),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1).otherwise(0))
    }
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(bucket(c1, b1), i).bitwiseAND(1), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftright(bucket(c2, b2), i).bitwiseAND(1), 2 * i))
    }.reduce(_ bitwiseOR _)
    // Tile = the top log2(nFiles) bits of z, i.e. one aligned curve
    // prefix = one rectangle of the (c1 × c2) rank plane. Send each tile
    // to its own partition EXACTLY: a sampled repartitionByRange(_z)
    // boundary that lands mid-tile smears one tile across two files and
    // widens both files' min/max boxes (measured: it cost the d-window
    // assertion one extra file). Hash partitioning is exact but collides
    // tile ids, so map each tile id through a representative int chosen
    // so that pmod(murmur3(rep), nFiles) == tile — a driver-side O(n)
    // search against the same hash Spark's HashPartitioning applies.
    val tileBits = 31 - Integer.numberOfLeadingZeros(nFiles)
    val shift = 2 * bits - tileBits
    val reps = new Array[Int](nFiles)
    val seen = new Array[Boolean](nFiles)
    var needed = nFiles
    var cand = 0
    while (needed > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(cand, 42)
      val p = ((h % nFiles) + nFiles) % nFiles
      if (!seen(p)) { seen(p) = true; reps(p) = cand; needed -= 1 }
      cand += 1
    }
    df.withColumn("_z", z)
      .withColumn("_pk", element_at(array(reps.map(lit): _*),
        shiftright(col("_z"), shift) + 1))
      .repartition(nFiles, col("_pk"))
      .sortWithinPartitions("_z")
      .drop("_z", "_pk") // physical order survives the projection
      .write.mode("overwrite").parquet(path)
  }

  /** MERGE (SCD-1 upsert) an updates frame into an existing partitioned
    * parquet layout by key, rewriting ONLY the partitions the updates
    * touch — the incremental-corpus-maintenance primitive (a new drop
    * revises some documents of some sources; the other 99% of the layout
    * is untouched bytes).
    *
    * TABLE-FORMAT NOTE (round 18, adjudicated in SURVEY §5): this is
    * exactly the operation a lakehouse table format gives for free —
    * `MERGE INTO` with snapshot isolation on Iceberg/Delta subsumes the
    * staged-temp-path + dynamic-partition-overwrite protocol below. The
    * offline classpath carries no connector jar, so the estate ships
    * the parquet protocol; on a cluster with the connector, swap this
    * call for MERGE INTO and keep the partitioning semantics unchanged
    * (the sink faces here use only the standard DataFrameWriter surface
    * both connectors implement).
    *
    * Semantics: within every partition value present in `updates`, rows
    * whose `keyCol` appears in `updates` are REPLACED, other rows are
    * kept, new keys are appended. Partitions absent from `updates` are
    * not read, not written, not listed.
    *
    * Two-phase by construction: the merged touched-partition rows are
    * materialized to a SIBLING staging directory first, then re-read and
    * committed with dynamic partition overwrite. Never read-and-overwrite
    * the same files in one job — the lazy scan's file list would be
    * deleted mid-job by its own write (the [[requireDistinctPaths]]
    * hazard, here made structurally impossible instead of just guarded).
    *
    * Scale: cost ∝ touched partitions' bytes, not the corpus. The
    * touched-partition filter is a broadcast semi-join (partition values
    * are few); the replace is a key anti-join inside those partitions
    * only. Returns the number of partition values rewritten.
    *
    * Caller contract: `updates` carries ONE row per key (this is a
    * MERGE, not an append — two update rows for the same key would both
    * land). Enforced: duplicate keys in `updates` fail the write.
    *
    * Caller contract 2: keys are PARTITION-STABLE — an update must carry
    * the key's existing partition value. A key that MOVES partitions
    * (old partition untouched by this batch) would leave its stale row
    * alive there: detecting that case requires reading every untouched
    * partition, exactly the cost this primitive exists to avoid, so it
    * cannot be an always-on check. Moves BETWEEN touched partitions are
    * handled correctly (the key anti-join spans all touched partitions).
    * `auditKeyMoves = true` opts into the full-layout audit: the write
    * fails if any update key still exists outside the touched set —
    * run it on low-traffic batches or after schema/partitioning changes,
    * at the documented price of one key-column scan of the layout. */
  def upsertPartitioned(spark: SparkSession, updates: DataFrame, path: String,
                        partitionCol: String, keyCol: String,
                        maxRecordsPerFile: Long = 5000000L,
                        auditKeyMoves: Boolean = false): Long = {
    val staging = path.stripSuffix("/") + ".upsert-staging"
    requireDistinctPaths(spark, path, staging)
    val dup = updates.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"upsert: updates carry duplicate $keyCol ${dup.headOption.map(_.get(0))} " +
        "— a merge takes one row per key")
    val touched = updates.select(partitionCol).distinct()
    if (auditKeyMoves) {
      // opt-in full-layout check (reads key+partition columns only):
      // an update key alive OUTSIDE the touched partitions is a moved
      // key whose stale row this merge would strand
      val stale = readPartitioned(spark, path)
        .join(broadcast(touched), Seq(partitionCol), "left_anti")
        .join(broadcast(updates.select(keyCol).distinct()), Seq(keyCol), "left_semi")
        .select(col(keyCol), col(partitionCol))
        .limit(1).collect()
      require(stale.isEmpty,
        s"upsert: key ${stale.headOption.map(_.get(0))} moved partitions — " +
          s"its stale row lives in untouched $partitionCol=" +
          s"${stale.headOption.map(_.get(1))}; include that partition's " +
          "rows in the update batch or delete the old row first")
    }
    val existing = readPartitioned(spark, path)
      .join(broadcast(touched), Seq(partitionCol), "left_semi")
    val merged = existing
      .join(broadcast(updates.select(keyCol).distinct()), Seq(keyCol), "left_anti")
      .unionByName(updates.select(existing.columns.map(col).toIndexedSeq: _*))
    merged.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol).parquet(staging)
    val nTouched = spark.read.parquet(staging).select(partitionCol)
      .distinct().count()
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol).parquet(path)
    val sp = new org.apache.hadoop.fs.Path(staging)
    sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)
    nTouched
  }

  /** Both compactors read `inPath` LAZILY while overwriting `outPath`;
    * called with the same (canonicalized) path they would clobber their
    * own input mid-scan. Enforce the write-to-new-then-swap contract. */
  private def requireDistinctPaths(spark: SparkSession, inPath: String,
                                   outPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inPath)
    val out = new org.apache.hadoop.fs.Path(outPath)
    val inQ = in.getFileSystem(conf).makeQualified(in)
    val outQ = out.getFileSystem(conf).makeQualified(out)
    require(inQ != outQ,
      s"compact: outPath must differ from inPath ($inQ) — " +
        "write to a new location, then swap")
  }
}
