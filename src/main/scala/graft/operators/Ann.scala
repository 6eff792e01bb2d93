package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFuns

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2-B rows 29-30).
  *
  * The query vector is a one-row broadcast (never a collect-loop); scoring
  * is a codegen'd higher-order-function dot product; top-k compiles to
  * TakeOrderedAndProject (per-partition heaps, no global sort). The LSH
  * variant prunes the scan to the query's sign-bucket — at cluster scale
  * the bucket id is the partition key, so a query touches 1/2^bits of the
  * data.
  */
object AnnOps {

  /** §2-29 `q_ann_topk`: brute-force cosine top-k against the query vector
    * (vec_id 0) — the exact baseline every ANN variant is validated
    * against. */
  def annTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    graft.plans.GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"),
        VectorFuns.l2normNative(col("embedding")).as("q_nrm"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(q))
      .select(col("vec_id"), col("label"),
        VectorFuns.cosine6Pre(col("embedding"), col("q_emb"),
          VectorFuns.l2normNative(col("embedding")), col("q_nrm")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** §2-30 `q_ann_lsh`: sign-LSH bucketed ANN — search ONLY the query's
    * bucket (sign bits of the first 8 dimensions). Exact float-sign
    * comparisons make the bucket engine-portable; recall is traded for a
    * 1/2^8 scan. */
  def annLsh(embeddings: DataFrame, queryId: Long = 0L, k: Int = 5): DataFrame = {
    graft.plans.GraftFunctions.register(embeddings.sparkSession)
    val bucketed = embeddings
      .withColumn("bucket", VectorFuns.signBucket(col("embedding")))
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"),
        VectorFuns.l2normNative(col("embedding")).as("q_nrm"))
    bucketed
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), col("bucket"),
        VectorFuns.cosine6Pre(col("embedding"), col("q_emb"),
          VectorFuns.l2normNative(col("embedding")), col("q_nrm")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-style ANN (the other classic scale path next to sign-LSH):
    * centroid per inverted-list (here the `label` partition stands in for
    * k-means cells), probe the `nProbe` nearest lists, search only those.
    *
    * Centroids are computed distributively (posexplode → per-(list, dim)
    * avg → re-assembled in dim order) — never collected to the driver; the
    * probed-list set IS broadcast (it's nProbe rows). At 100 TB the list id
    * is the partition key, so a query touches nProbe/nLists of the data.
    * Spec-tested (no DuckDB oracle: centroid averaging is float-order
    * sensitive; the RESULT contract — hits come only from probed lists,
    * recall vs brute force — is asserted instead). */
  def annIvf(embeddings: DataFrame, queryId: Long = 0L, k: Int = 5,
             nProbe: Int = 2): DataFrame = {
    graft.plans.GraftFunctions.register(embeddings.sparkSession)
    val centroids = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("label"), col("i"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c").cast("float")).as("centroid"))
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"),
        VectorFuns.l2normNative(col("embedding")).as("q_nrm"))
    val probed = centroids.join(broadcast(q))
      .select(col("label"),
        (VectorFuns.dotNative(col("centroid"), col("q_emb")) /
          (VectorFuns.l2normNative(col("centroid")) * col("q_nrm"))).as("c_score"))
      .orderBy(col("c_score").desc, col("label").asc)
      .limit(nProbe)
      .select(col("label"))
    embeddings
      .join(broadcast(probed), "label")
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(q))
      .select(col("vec_id"), col("label"),
        VectorFuns.cosine6Pre(col("embedding"), col("q_emb"),
          VectorFuns.l2normNative(col("embedding")), col("q_nrm")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  val oracles: Map[String, String] = Map(
    "q_ann_topk" ->
      s"""SELECT e.vec_id, e.label,
         |  ${VectorFuns.sql.cosine6("e.embedding", "q.embedding")} AS score
         |FROM embeddings e
         |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |WHERE e.vec_id <> 0
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, label, embedding,
         |    ${VectorFuns.sql.signBucket("embedding")} AS bucket
         |  FROM embeddings
         |), q AS (SELECT embedding, bucket FROM b WHERE vec_id = 0)
         |SELECT b.vec_id, b.label, b.bucket,
         |  ${VectorFuns.sql.cosine6("b.embedding", "q.embedding")} AS score
         |FROM b JOIN q ON b.bucket = q.bucket
         |WHERE b.vec_id <> 0
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 5""".stripMargin
  )
}
