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
    val e = Tables.embeddings(spark, sfDir)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        VectorFuns.dot(col("a.embedding"), col("b.embedding")).as("hof_dot"),
        VectorFuns.dotNative(col("a.embedding"), col("b.embedding")).as("nat_dot"),
        VectorFuns.l2norm(col("a.embedding")).as("hof_norm"),
        VectorFuns.l2normNative(col("a.embedding")).as("nat_norm"))
    assert(pairs.filter(col("hof_dot") =!= col("nat_dot")).count() == 0)
    assert(pairs.filter(col("hof_norm") =!= col("nat_norm")).count() == 0)
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
