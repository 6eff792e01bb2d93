package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_set` of int64 keys with a HARD buffer cap — for inverted-index
  * builds whose downstream filter discards any list longer than `cap`.
  *
  * The built-in `collect_set` materializes the full distinct set per key
  * in one aggregation buffer before any filter can run: a boilerplate
  * shingle present in 10⁸ documents ("all rights reserved") would build a
  * multi-GB set that the very next operator throws away — the classic
  * hot-key executor OOM. This aggregate stops accumulating at `cap + 1`
  * elements: lists that stay ≤ cap are EXACT; lists that reach cap + 1
  * are already doomed (size > cap fails the df filter), and once a
  * partial buffer is over the cap every merge superset is too, so
  * saturation is safe to keep. Buffer memory is O(cap) per key no matter
  * how hot the key.
  *
  * Deliberately minimal (int64 elements, no codegen): aggregation
  * buffers are imperative by nature — `TypedImperativeAggregate` is the
  * sanctioned extension point, and the hot path (a hash-set add) is
  * already primitive work.
  */
case class CollectSetCapped(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Long]] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def createAggregationBuffer(): mutable.HashSet[Long] =
    new mutable.HashSet[Long]

  override def update(buffer: mutable.HashSet[Long],
                      input: InternalRow): mutable.HashSet[Long] = {
    // saturate at cap + 1: enough to prove "over the cap", never more
    if (buffer.size <= cap) {
      val v = child.eval(input)
      if (v != null) buffer += v.asInstanceOf[Long]
    }
    buffer
  }

  override def merge(buffer: mutable.HashSet[Long],
                     other: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    val it = other.iterator
    while (it.hasNext && buffer.size <= cap) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.HashSet[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new mutable.HashSet[Long]
    var i = 0
    while (i < n) { s += bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectSetCapped =
    copy(child = newChildren.head)
  override def prettyName: String = "collect_set_capped"
}
