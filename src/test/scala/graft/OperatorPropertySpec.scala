package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.{MultimodalOps, Skew}

/** Property tests for the operators whose edge cases live in arithmetic
  * (frame boundaries, salt replication) rather than data: random inputs
  * against a plain-Scala model. */
class OperatorPropertySpec extends SparkSpec {

  test("frameSample matches the arithmetic model for arbitrary payload lengths") {
    import spark.implicits._
    val frameBytes = 8
    val everyNth = 3
    val lens = Gen.listOfN(60, Gen.choose(0, 100)).sample.get.distinct
    val docs = lens.zipWithIndex
      .map { case (len, id) => (id.toLong, "x" * len) }
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val got = MultimodalOps.frameSample(docs, frameBytes, everyNth).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Int]("frame_idx")).sorted.toSeq).toMap
    lens.zipWithIndex.foreach { case (len, id) =>
      val nFrames = len / frameBytes
      val expected = (0 until nFrames).filter(_ % everyNth == 0)
      assert(got.getOrElse(id.toLong, Seq.empty) == expected,
        s"len=$len expected=$expected got=${got.get(id.toLong)}")
    }
    // every emitted frame is full-size
    val sizes = MultimodalOps.frameSample(docs, frameBytes, everyNth)
      .select(octet_length(col("frame"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ == frameBytes))
  }

  test("saltedJoin matches the plain join for arbitrary key distributions") {
    import spark.implicits._
    val leftRows = Gen.listOfN(200, for {
      id <- Gen.choose(0L, 1000L)
      k <- Gen.choose(0L, 10L) // few keys → heavy collisions, some misses
    } yield (id, k)).sample.get.distinct
    val rightRows = Gen.listOfN(8, for {
      k <- Gen.choose(0L, 15L) // some keys unmatched on either side
      v <- Gen.alphaLowerStr.map(_.take(4))
    } yield (k, v)).sample.get.distinctBy(_._1)
    val left = leftRows.toDF("id", "k")
    val right = rightRows.toDF("k", "v")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = jt match {
        case "left_semi" => left.join(right, Seq("k"), "left_semi")
          .select("id", "k")
        case "left_anti" => left.join(right, Seq("k"), "left_anti")
          .select("id", "k")
        case t => left.join(right, left("k") === right("k"), t)
          .select(left("id"), left("k"), right("v"))
      }
      val salted = Skew.saltedJoin(left, right, "k",
        saltBy = col("id"), salts = 5, joinType = jt)
      val saltedCols = salted.select(plain.columns.map(col): _*)
      assert(saltedCols.exceptAll(plain).count() == 0, s"$jt extra rows")
      assert(plain.exceptAll(saltedCols).count() == 0, s"$jt missing rows")
    }
  }
}
