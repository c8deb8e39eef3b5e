package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** minhash_sig(h): one-pass MinHash signature aggregate.
  *
  * Input: a 64-bit non-negative element hash per row (e.g.
  * `xxhash64(shingle) & 0x7fffffff`). Buffer: Array[Long](numPerms) of the
  * running minima of (aᵢ·h + bᵢ) mod p. Replaces a 64-column
  * `min(pmod(...))` aggregate: one buffer update per row instead of 64
  * independent agg slots through the codegen'd row layout, and the
  * signature travels the shuffle as ONE array value. Same permutation
  * constants as Dedup.perms — deterministic across runs and partitionings
  * (min is commutative/associative, so partial+merge is exact).
  */
case class MinHashAgg(
    child: Expression,
    perms: Seq[(Long, Long)],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val n = perms.length
  private val as: Array[Long] = perms.map(_._1).toArray
  private val bs: Array[Long] = perms.map(_._2).toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val x = (as(i) * h + bs(i)) % prime
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  def minhashSig(h: Column, perms: Seq[(Long, Long)], prime: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(h), perms, prime).toAggregateExpression())
}
