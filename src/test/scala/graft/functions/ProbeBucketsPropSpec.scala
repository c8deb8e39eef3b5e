package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Property spec for [[ProbeBuckets]] (VERDICT r8 #2 / r9 #6): the
  * multiprobe key generator feeds every LSH candidate join
  * (dd_embed_bucketed, ann_lsh), so its two execution paths must agree
  * bit-for-bit and its combinatorics must be exact:
  *
  *  - interpreted `nullSafeEval` ≡ the codegen path (`doGenCode`), on
  *    random signatures across B ∈ {4..20}, L ∈ {1,2,4}, depth ∈ {0..3};
  *  - probe-set size is exactly
  *    L·(1 + B·[d≥1] + B(B−1)/2·[d≥2] + B(B−1)(B−2)/6·[d≥3]);
  *  - no duplicate keys: within a table every hamming-≤d flip of a B-bit
  *    base is distinct, and the table id in the upper 32 bits separates
  *    tables.
  */
class ProbeBucketsPropSpec extends SparkSuite {

  private val rnd = new scala.util.Random(20260813)

  private def expectedSize(tables: Int, bits: Int, depth: Int): Int =
    tables * (1 + (if (depth >= 1) bits else 0) +
      (if (depth >= 2) bits * (bits - 1) / 2 else 0) +
      (if (depth >= 3) bits * (bits - 1) * (bits - 2) / 6 else 0))

  /** Interpreted path, straight through the expression (no plan, no
    * codegen): exactly what a fallback/interpreted projection runs.
    */
  private def interpreted(sig: Array[Int], tables: Int, bits: Int, depth: Int): Seq[Long] = {
    val e = ProbeBuckets(Literal.create(sig, ArrayType(IntegerType)), tables, bits, depth)
    e.nullSafeEval(ArrayData.toArrayData(sig))
      .asInstanceOf[ArrayData].toLongArray().toSeq
  }

  /** Codegen path: evaluate through a DataFrame projection with
    * whole-stage codegen on (the default), so doGenCode is what runs.
    */
  private def viaCodegen(sigs: Seq[(Long, Array[Int])], tables: Int, bits: Int,
                         depth: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    sigs.toDF("id", "sig")
      .select(col("id"),
        HyperplaneSigs.probeBuckets(col("sig"), tables, bits, depth).as("probes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  test("interpreted ≡ codegen, exact probe count, no duplicate keys (B ∈ 4..20)") {
    for (bits <- 4 to 20; depth <- 0 to 3) {
      val tables = Seq(1, 2, 4)(rnd.nextInt(3))
      val sigs = (0 until 25).map { i =>
        i.toLong -> Array.fill(tables)(rnd.nextInt(1 << bits))
      }
      val fromCodegen = viaCodegen(sigs, tables, bits, depth)
      sigs.foreach { case (id, sig) =>
        val want = interpreted(sig, tables, bits, depth)
        val got = fromCodegen(id)
        assert(got == want,
          s"codegen != interpreted at B=$bits L=$tables d=$depth sig=${sig.mkString(",")}")
        assert(got.size == expectedSize(tables, bits, depth),
          s"probe count ${got.size} != ${expectedSize(tables, bits, depth)} " +
            s"at B=$bits L=$tables d=$depth")
        assert(got.distinct.size == got.size,
          s"duplicate probe keys at B=$bits L=$tables d=$depth")
        // Every key's table id must be in range and its bucket within B bits.
        assert(got.forall(k => (k >>> 32) < tables && (k & 0xFFFFFFFFL) < (1L << bits)),
          s"key out of (table, bucket) range at B=$bits L=$tables d=$depth")
      }
    }
  }

  test("directional mode: base plus 0→1 flips only, codegen ≡ interpreted") {
    for (bits <- 4 to 20) {
      val tables = Seq(1, 2, 4)(rnd.nextInt(3))
      val sigs = (0 until 25).map { i =>
        i.toLong -> Array.fill(tables)(rnd.nextInt(1 << bits))
      }
      import spark.implicits._
      val fromCodegen = sigs.toDF("id", "sig")
        .select(col("id"),
          HyperplaneSigs.probeBuckets(col("sig"), tables, bits, depth = 1,
            directional = true).as("probes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      sigs.foreach { case (id, sig) =>
        val e = ProbeBuckets(Literal.create(sig, ArrayType(IntegerType)),
          tables, bits, 1, directional = true)
        val want = e.nullSafeEval(ArrayData.toArrayData(sig))
          .asInstanceOf[ArrayData].toLongArray().toSeq
        assert(fromCodegen(id) == want,
          s"directional codegen != interpreted at B=$bits L=$tables")
        // Exactly the base key plus one flip per ZERO bit of each base.
        val byTable = want.groupBy(k => (k >>> 32).toInt)
        (0 until tables).foreach { t =>
          val base = sig(t)
          val zeros = (0 until bits).count(b => (base & (1 << b)) == 0)
          val keys = byTable(t).map(_ & 0xFFFFFFFFL)
          assert(keys.size == 1 + zeros, s"directional count at B=$bits t=$t")
          val wantKeys = (base.toLong & 0xFFFFFFFFL) +:
            (0 until bits).filter(b => (base & (1 << b)) == 0)
              .map(b => (base ^ (1 << b)).toLong & 0xFFFFFFFFL)
          assert(keys.sorted == wantKeys.sorted,
            s"directional keys are not base + 0→1 flips at B=$bits t=$t")
        }
      }
    }
  }

  test("depth-d probe set is exactly the hamming ≤ d ball around each base") {
    val bits = 8; val tables = 2
    val sig = Array(0xA5, 0x3C)
    for (depth <- 2 to 3) {
      val got = interpreted(sig, tables, bits, depth)
      val want = (0 until tables).flatMap { t =>
        val ball = (0 until (1 << bits)).filter { b =>
          Integer.bitCount(b ^ sig(t)) <= depth
        }
        ball.map(b => (t.toLong << 32) | b)
      }
      assert(got.sorted == want.sorted,
        s"probe keys are not exactly the hamming-≤$depth ball")
    }
  }
}
