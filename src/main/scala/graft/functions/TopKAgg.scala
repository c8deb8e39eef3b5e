package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** topk(id, score, k): bounded top-k aggregate — the scale-correct
  * replacement for `row_number().over(Window.partitionBy(g).orderBy(score
  * desc)) <= k`.
  *
  * The window form shuffles EVERY candidate row to its group's partition
  * and sorts there: for an ANN query fanning out to N candidates that is an
  * O(N)-row shuffle + sort per group. This aggregate keeps a bounded buffer
  * (≤ 4k entries, compacted back to k) per group on the MAP side, so only
  * k rows per group ever cross the shuffle — |groups|·k total, independent
  * of candidate fan-out.
  *
  * Semantics: top k DISTINCT ids ordered by (score desc, id asc). Duplicate
  * ids keep their max score — LSH candidates that collide in several hash
  * tables (same (id, score) seen L times) dedupe for free, replacing a
  * `distinct()` over wide embedding rows with buffer-local dedupe.
  *
  * Determinism: total order (score desc, id asc) has no ties, and
  * compaction only ever evicts entries strictly dominated by k others, so
  * partial/merge order cannot change the result (same contract the
  * reference's sequential sort-based reduce gives, mr/coordinator.go-style
  * determinism; see also MinHashAgg).
  *
  * NaN scores are DROPPED (deliberate: `s > old` is false for NaN). A NaN
  * similarity — e.g. cosine against a zero-norm vector — is "no
  * information", not "best match"; the window-rank formulation this
  * replaces inherited Spark's NaN-sorts-greatest and ranked such pairs
  * FIRST, which was never the wanted semantics.
  */
case class TopKAgg(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Double]] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Long, Double] =
    mutable.HashMap.empty

  /** Keep the buffer bounded: above 4k entries, retain only the current
    * top k. Safe under identical-score duplicates: an evicted id is
    * dominated by k better (score, id) pairs that all survive compaction,
    * so it can never re-enter the final top k.
    */
  private def compact(buf: mutable.HashMap[Long, Double]): Unit =
    if (buf.size > 4 * k) {
      val keep = buf.toArray.sortBy { case (id, s) => (-s, id) }.take(k)
      buf.clear()
      buf ++= keep
    }

  override def update(buf: mutable.HashMap[Long, Double], input: InternalRow): mutable.HashMap[Long, Double] = {
    val idV = idExpr.eval(input)
    val scV = scoreExpr.eval(input)
    if (idV != null && scV != null) {
      // Accept any integral id / numeric score (AbstractDataType is
      // private[sql], so ImplicitCastInputTypes is unavailable out here).
      val id = idV.asInstanceOf[Number].longValue()
      val s = scV.asInstanceOf[Number].doubleValue()
      val old = buf.getOrElse(id, Double.NegativeInfinity)
      if (s > old) buf.update(id, s)
      compact(buf)
    }
    buf
  }

  override def merge(a: mutable.HashMap[Long, Double], b: mutable.HashMap[Long, Double]): mutable.HashMap[Long, Double] = {
    b.foreach { case (id, s) =>
      val old = a.getOrElse(id, Double.NegativeInfinity)
      if (s > old) a.update(id, s)
    }
    compact(a)
    a
  }

  override def eval(buf: mutable.HashMap[Long, Double]): Any = {
    val top = buf.toArray.sortBy { case (id, s) => (-s, id) }.take(k)
    new GenericArrayData(top.map { case (id, s) =>
      InternalRow(id, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[Long, Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (id, s) => bb.putLong(id); bb.putDouble(s) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = mutable.HashMap.empty[Long, Double]
    var i = 0
    while (i < n) { m.update(bb.getLong(), bb.getDouble()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

object TopKAgg {
  /** Column form: array<struct<id,score>> of the top k distinct ids by
    * (score desc, id asc). Pair with posexplode for (rank-1, entry).
    */
  def topk(id: Column, score: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(id), ColumnBridge.expression(score), k)
        .toAggregateExpression())
}
