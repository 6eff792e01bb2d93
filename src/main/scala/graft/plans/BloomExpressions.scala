package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A deterministic, oracle-mirrorable Bloom filter over strings — the
  * decontamination scale-out past `CorpusOps.contaminationNgram`'s
  * inverted-index join: the probe set compresses to a bitmap measured in
  * KB that BROADCASTS, so the 100 TB gram stream is screened by a
  * row-level codegen'd filter with NO join and NO shuffle; only the
  * (rare, false-positive-superset) hits ever move. The exact rescreen
  * then runs on the survivors, which is the standard two-phase
  * bloom-then-exact decontamination pipeline.
  *
  * Hash family: bit position j (j = 1..4) of item `s` is the first
  * `hexChars` hex digits of md5(byte(j) ++ utf8(s)) — the same salted
  * digest family the MinHash signatures use (GraftHash.minhashSlices),
  * so the DuckDB oracle can simulate the filter EXACTLY with
  * `substr(md5(chr(j) || s), 1, hexChars)` against the distinct
  * position set: the membership verdicts — including false positives —
  * are bit-identical across engines, which makes the bloom query fully
  * hash-checkable, not just rows-only.
  *
  * Sizing: m = 2^(4·hexChars) bits. hexChars=4 → 8 KiB (fpp ≈
  * (1-e^(-4n/m))⁴ ≈ 1% at n ≈ 4.6k items); hexChars=5 → 128 KiB (~70k
  * items at 1%); hexChars=7 → 32 MiB (~18M items at 1%) — still a
  * broadcastable fraction of a full eval-suite n-gram set. k = 4 salts
  * is fixed (the fpp knob is m).
  */
object GraftBloom {
  /** Number of salted hash functions (fixed — size via `hexChars`). */
  val Salts = 4

  /** Default position width: 4 hex digits = 16-bit positions = 8 KiB. */
  val DefaultHexChars = 4

  val MaxHexChars = 7 // 2^28 bits = 32 MiB — keep the broadcast sane

  def numBytes(hexChars: Int): Int = 1 << (4 * hexChars - 3)

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Bit position for salt `j`: the integer value of the first `hexChars`
    * hex digits of md5(byte(j) ++ utf8(s)) — i.e. the high 4·hexChars
    * bits of the digest, oracle-spelled substr(md5(chr(j) || s), 1, hexChars). */
  def position(md: MessageDigest, s: UTF8String, j: Int, hexChars: Int): Int = {
    md.update(j.toByte)
    md.update(s.getBytes)
    val d = md.digest()
    var p = 0
    var i = 0
    while (i < hexChars) {
      val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf else d(i >> 1) & 0xf
      p = (p << 4) | nib
      i += 1
    }
    p
  }

  def add(bloom: Array[Byte], s: UTF8String, hexChars: Int): Unit = {
    val md = mdLocal.get()
    var j = 1
    while (j <= Salts) {
      val p = position(md, s, j, hexChars)
      bloom(p >> 3) = (bloom(p >> 3) | (1 << (p & 7))).toByte
      j += 1
    }
  }

  def mightContain(bloom: Array[Byte], s: UTF8String, hexChars: Int): Boolean = {
    if (bloom.length != numBytes(hexChars)) {
      throw new IllegalArgumentException(
        s"bloom_contains: filter is ${bloom.length} bytes but hexChars=" +
          s"$hexChars expects ${numBytes(hexChars)} — build and probe must " +
          "use the same hexChars")
    }
    val md = mdLocal.get()
    var j = 1
    while (j <= Salts) {
      val p = position(md, s, j, hexChars)
      if ((bloom(p >> 3) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }
}

/** `bloom_agg(item[, hexChars])` → the packed Bloom bitmap (binary) over
  * the group's items (see [[GraftBloom]]). Merge is a byte-wise OR, so
  * partial aggregation is exact and the shuffle carries one bitmap per
  * partition — building the filter over 10⁶ probe grams costs one scan
  * of the probe table and moves KB. */
case class BloomAgg(
    child: Expression,
    hexChars: Int = GraftBloom.DefaultHexChars,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(hexChars >= 1 && hexChars <= GraftBloom.MaxHexChars,
    s"hexChars=$hexChars out of range: 1..${GraftBloom.MaxHexChars}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](GraftBloom.numBytes(hexChars))

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) GraftBloom.add(buffer, v.asInstanceOf[UTF8String], hexChars)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) = (buffer(i) | other(i)).toByte
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_contains(bloom, item[, hexChars])` → true iff all four salted
  * positions of `item` are set in `bloom` — the codegen'd row-level
  * membership probe ([[GraftBloom.mightContain]]): may false-positive
  * (rate set by `hexChars`), never false-negative. */
case class BloomMightContain(
    left: Expression,
    right: Expression,
    hexChars: Int = GraftBloom.DefaultHexChars)
  extends BinaryExpression {

  require(hexChars >= 1 && hexChars <= GraftBloom.MaxHexChars,
    s"hexChars=$hexChars out of range: 1..${GraftBloom.MaxHexChars}")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(bloom: Any, item: Any): Any =
    GraftBloom.mightContain(bloom.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      s"graft.plans.GraftBloom.mightContain($b, $s, $hexChars)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
