package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Property tests for TopKAgg's buffer machinery — it ranks four ANN
  * queries, so its compaction/dedupe/merge logic must be exactly the
  * sort-based reference under ANY partitioning of the input. Drives
  * update/merge/eval directly (the same calls Spark's ObjectHashAggregate
  * makes), with ScalaCheck-generated inputs and random split points
  * (fixed seeds — deterministic).
  */
class TopKAggPropSpec extends AnyFunSuite {

  private def agg(k: Int) =
    TopKAgg(BoundReference(0, LongType, nullable = false),
      BoundReference(1, DoubleType, nullable = false), k)

  /** Sort-based reference: dedupe by id keeping max score, order by
    * (score desc, id asc), take k.
    */
  private def reference(xs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    xs.groupBy(_._1).map { case (id, vs) => (id, vs.map(_._2).max) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(k)

  private def evalToSeq(a: TopKAgg, buf: scala.collection.mutable.HashMap[Long, Double]): Seq[(Long, Double)] = {
    val arr = a.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getLong(0), r.getDouble(1))
    }
  }

  private val rowsGen: Gen[List[(Long, Double)]] = Gen.listOf(
    for {
      id <- Gen.chooseNum(-50L, 50L) // narrow id range → many duplicates
      s <- Gen.chooseNum(-1000, 1000).map(_ / 64.0) // finite, tie-prone
    } yield (id, s))

  test("update+merge+eval equals the sort-based reference under arbitrary splits") {
    var failures = 0
    for (i <- 0 until 300) {
      val xs = rowsGen(Gen.Parameters.default, Seed(7L + i)).getOrElse(Nil)
      val k = 1 + (i % 7)
      val a = agg(k)
      // Random split into 1..4 chunks, each its own partial buffer.
      val nChunks = 1 + (i % 4)
      val chunks = if (xs.isEmpty) Seq(Nil) else xs.grouped(math.max(1, xs.size / nChunks)).toSeq
      val buffers = chunks.map { c =>
        val b = a.createAggregationBuffer()
        c.foreach { case (id, s) => a.update(b, InternalRow(id, s)) }
        b
      }
      // Merge in sequence (merge order must not matter).
      val merged = buffers.reduceLeft { (x, y) => a.merge(x, y) }
      val got = evalToSeq(a, merged)
      val want = reference(xs, k)
      if (got != want) {
        failures += 1
        info(s"seed=$i k=$k got=$got want=$want")
      }
    }
    assert(failures == 0, s"$failures/300 generated cases diverged")
  }

  test("serialize/deserialize round-trips the buffer") {
    val a = agg(3)
    val b = a.createAggregationBuffer()
    Seq((1L, 0.5), (2L, -1.0), (1L, 0.7), (9L, 3.14)).foreach {
      case (id, s) => a.update(b, InternalRow(id, s))
    }
    val back = a.deserialize(a.serialize(b))
    assert(back == b)
    assert(evalToSeq(a, back) == Seq((9L, 3.14), (1L, 0.7), (2L, -1.0)))
  }

  test("compaction keeps correctness with far more rows than 4k") {
    val k = 2
    val a = agg(k)
    val b = a.createAggregationBuffer()
    // 10_000 distinct ids → many compactions at the 4k bound.
    val xs = (0 until 10000).map(i => ((i * 2654435761L) % 100003, (i % 997) / 7.0))
    xs.foreach { case (id, s) => a.update(b, InternalRow(id, s)) }
    assert(b.size <= 4 * k * 2, "buffer not bounded by compaction")
    assert(evalToSeq(a, b) == reference(xs, k))
  }
}
