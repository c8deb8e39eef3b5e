package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Independent replay of the ANN index-CONSTRUCTION steps (round 16,
  * VERDICT r15 #4): the dynamic DuckDB oracles inline the frozen index
  * artifacts as SQL literals, so they verify every distributed EXECUTION
  * stage but are blind to construction — a centroid-sampling or
  * codebook-training bug ships identical wrong artifacts to both sides
  * of the differential and reaches only the recall instruments. This
  * spec re-derives each artifact class from first principles in plain
  * spec-local code (Spark used ONLY to evaluate the xxhash64 builtin and
  * read parquet) and asserts bit-equality with the shipped builders:
  *
  *  - hash-sampled centroid selection (the "ivf" model slot:
  *    stride = ⌊n/k⌋, k = max(16, ⌈√n⌉), pmod(hash) == 0, ids sorted
  *    ascending, unit-normalized from float-to-double division);
  *  - one PQ codebook subspace's full training run (hash-stride sample
  *    sorted by id, unit-normalize, seeded shuffled-index init,
  *    5 Lloyd iterations with SEQUENTIAL index-order sum accumulation,
  *    empty clusters keeping their previous centroid).
  *
  * Constants (k floor 16, stride rule, sample caps, seed 4242, 5 iters,
  * 8×8 PQ geometry) are deliberately RESTATED as literals here, not
  * imported: a drive-by change to the builder's semantics must fail this
  * spec and force the mutation to be intentional on both sides.
  * Mutation-checked once at introduction: a +1 on the sampling stride and
  * a swapped init order each broke the corresponding assert (ROUND16.md).
  */
class AnnConstructionSpec extends SparkSuite {

  private val dim = 64

  private def unitized(v: Array[Double]): Array[Double] = {
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm == 0.0) v else v.map(_ / nrm)
  }

  test("ivf centroid selection replays from first principles") {
    val emb = graft.Tables.embeddings(spark, sf)
    val rows = emb.select(col("vec_id"), xxhash64(col("vec_id")).as("h"),
        col("embedding")).collect()
    val n = rows.length.toLong
    val k = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val stride = math.max(1L, n / k)
    val picked = rows.filter(r => java.lang.Math.floorMod(r.getLong(1), stride) == 0L)
      .sortBy(_.getLong(0))
    assert(picked.length >= 16 / 2,
      s"degenerate replay: only ${picked.length} centroids at n=$n")
    val expIds = picked.map(_.getLong(0))
    val expUnit = picked.flatMap { r =>
      val v = r.getSeq[Float](2).toArray.map(_.toDouble)
      unitized(v).padTo(dim, 0.0).take(dim)
    }
    val (ids, unit) = Similarity.ivfModelOf(emb)
    assert(ids.sameElements(expIds),
      s"centroid id set diverged: shipped ${ids.take(5).mkString(",")}… vs " +
        s"replay ${expIds.take(5).mkString(",")}… (${ids.length} vs ${expIds.length})")
    assert(unit.sameElements(expUnit),
      "centroid matrix diverged from the first-principles replay")
  }

  test("pq codebook training replays from first principles (all subspaces)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val rows = emb.select(col("vec_id"), xxhash64(col("vec_id")).as("h"),
        col("embedding")).collect()
    val n = rows.length.toLong
    val stride = math.max(1L, n / 32768L)
    val sample = rows.filter(r => java.lang.Math.floorMod(r.getLong(1), stride) == 0L)
      .sortBy(_.getLong(0))
      .map(r => unitized(r.getSeq[Float](2).toArray.map(_.toDouble)))
    val expKsub = math.min(256, sample.length)
    val subDim = 8
    def replayKmeans(points: Array[Array[Double]], k: Int, seedOffset: Int)
        : Array[Double] = {
      val rnd = new scala.util.Random(4242 + seedOffset)
      val order = rnd.shuffle(points.indices.toVector)
      var cents = order.take(k).map(i => points(i).clone).toArray
      for (_ <- 0 until 5) {
        val assign = points.map { p =>
          var best = 0; var bestD = Double.PositiveInfinity
          for (c <- cents.indices) {
            var d = 0.0
            for (t <- 0 until subDim) { val x = p(t) - cents(c)(t); d += x * x }
            if (d < bestD) { bestD = d; best = c }
          }
          best
        }
        val sums = Array.fill(cents.length, subDim)(0.0)
        val counts = new Array[Long](cents.length)
        for (i <- points.indices) {
          for (t <- 0 until subDim) sums(assign(i))(t) += points(i)(t)
          counts(assign(i)) += 1
        }
        cents = cents.indices.map(c =>
          if (counts(c) == 0L) cents(c) else sums(c).map(_ / counts(c))).toArray
      }
      cents.flatten
    }
    val (ksub, books) = Similarity.pqBooksCached(emb, n)
    assert(ksub == expKsub, s"ksub diverged: shipped $ksub vs replay $expKsub")
    for (s <- 0 until 8) {
      val slice = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      val expBook = replayKmeans(slice, expKsub, s)
      val shipped = books.slice(s * expKsub * subDim, (s + 1) * expKsub * subDim)
      assert(shipped.sameElements(expBook),
        s"pq codebook subspace $s diverged from the first-principles replay")
    }
  }
}
