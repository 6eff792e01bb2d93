package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFuns
import graft.plans.GraftFunctions
import graft.sources.Tables

/** The native codegen expressions must be BIT-IDENTICAL to the HOF
  * formulation (same sequential double fold) — the oracle parity of every
  * cosine-based query depends on it. */
class FloatVectorExprSpec extends SparkSpec {

  test("FloatDot / FloatNorm match the higher-order-function arithmetic exactly") {
    GraftFunctions.register(spark)
    // exclude the rewrite rule so the HOF side really runs the HOF fold
    // (RewriteHofVectorOps would otherwise turn both sides native)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.RewriteHofVectorOps")
    try {
      val e = Tables.embeddings(spark, sfDir)
      val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .limit(500)
        .select(
          VectorFuns.dot(col("a.embedding"), col("b.embedding")).as("hof_dot"),
          VectorFuns.dotNative(col("a.embedding"), col("b.embedding")).as("nat_dot"),
          VectorFuns.l2norm(col("a.embedding")).as("hof_norm"),
          VectorFuns.l2normNative(col("a.embedding")).as("nat_norm"))
      // the exclusion must actually have kept the HOF fold in the plan
      val p = pairs.queryExecution.optimizedPlan.toString
      assert(p.contains("aggregate("), p)
      assert(pairs.filter(col("hof_dot") =!= col("nat_dot")).count() == 0)
      assert(pairs.filter(col("hof_norm") =!= col("nat_norm")).count() == 0)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("RewriteHofVectorOps turns the HOF dot/norm into native expressions") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val df = e.select(
      VectorFuns.dot(col("embedding"), col("embedding")).as("d"),
      VectorFuns.l2norm(col("embedding")).as("n"))
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("float_dot"), p)
    assert(p.contains("float_norm"), p)
    assert(!p.contains("zip_with"), p)
    // and the rewritten plan computes the same values as the native calls
    val direct = e.select(
      VectorFuns.dotNative(col("embedding"), col("embedding")).as("d"),
      VectorFuns.l2normNative(col("embedding")).as("n"))
    assert(df.exceptAll(direct).count() == 0)
  }

  test("RewriteHofVectorOps rewrites the HOF pattern written in raw SQL text") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_hof")
    val df = spark.sql(
      """SELECT vec_id,
        |  aggregate(zip_with(embedding, embedding,
        |    (x, y) -> cast(x as double) * cast(y as double)),
        |    cast(0.0 as double), (acc, v) -> acc + v) AS d
        |FROM emb_hof""".stripMargin)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("float_dot"), p)
  }

  test("RewriteHofVectorOps leaves non-matching folds untouched") {
    import spark.implicits._
    // double arrays (not float): must NOT rewrite — FloatDot reads floats
    val dd = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val df = dd.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("float_dot"), p)
    assert(df.head().getDouble(0) == 11.0)
    // non-zero seed: must NOT rewrite
    val e = Tables.embeddings(spark, sfDir).limit(5)
    val seeded = e.select(aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!seeded.queryExecution.optimizedPlan.toString.contains("float_dot"))
  }

  test("edge inputs match the HOF: unequal lengths and null elements → NULL") {
    GraftFunctions.register(spark)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.RewriteHofVectorOps")
    try {
      import spark.implicits._
      val df = Seq(
        (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f)),      // unequal
        (Array[java.lang.Float](1f, null), Array[java.lang.Float](3f, 4f)), // null elem
        (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f))   // clean
      ).toDF("a", "b")
      val r = df.select(
        VectorFuns.dot(col("a"), col("b")).as("hof"),
        VectorFuns.dotNative(col("a"), col("b")).as("nat"),
        VectorFuns.l2norm(col("a")).as("hof_n"),
        VectorFuns.l2normNative(col("a")).as("nat_n")).collect()
      r.foreach { row =>
        assert(row.isNullAt(0) == row.isNullAt(1), row.toString)
        assert(row.isNullAt(2) == row.isNullAt(3), row.toString)
        if (!row.isNullAt(0)) assert(row.getDouble(0) == row.getDouble(1))
        if (!row.isNullAt(2)) assert(row.getDouble(2) == row.getDouble(3))
      }
      assert(r(0).isNullAt(1) && r(1).isNullAt(1) && !r(2).isNullAt(1))
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("rp_band_keys matches the declarative round/cast formulation bit-for-bit") {
    GraftFunctions.register(spark)
    import graft.plans.RpLsh
    // The native expression replicates Spark round's shortest-decimal
    // HALF_UP quantization in Scala; this builds the same keys out of
    // Spark's OWN round()/cast/sum expressions — if the two ever drift,
    // the q_dedup_embedding_rp oracle drifts with them.
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("qv", transform(col("embedding"),
        v => round(v.cast("double") * lit(1e6), 0).cast("long")))
    def declaredKey(band: Int) =
      (0 until RpLsh.BitsPerBand).map { i =>
        val dot = RpLsh.planes(band * RpLsh.BitsPerBand + i).zipWithIndex
          .map { case (cf, d) => lit(cf) * element_at(col("qv"), d + 1) }
          .reduce(_ + _)
        when(dot > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _).cast("int")
    val df = e.select(
      call_function("rp_band_keys", col("embedding")).as("nat"),
      array((0 until RpLsh.Bands).map(declaredKey): _*).as("dec"))
    assert(df.filter(col("nat") =!= col("dec")).count() == 0)
    assert(df.count() > 0)
  }

  test("native expressions survive both codegen and interpreted eval") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      VectorFuns.dotNative(col("a"), col("b")).as("d"),
      VectorFuns.l2normNative(col("a")).as("n")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-15)
    // interpreted path (no codegen)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r2 = df.select(VectorFuns.dotNative(col("a"), col("b"))).head()
      assert(r2.getDouble(0) == 32.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
