package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The round-10 recall calibrators (Similarity.calibratedNprobe /
  * calibratedLsh) exist to make probe cost ADAPT to the data's intrinsic
  * structure: clustered corpora (the real-embedding case) must get cheap
  * configurations, and structureless corpora must pay what the recall
  * target demands instead of silently missing neighbors. This spec pins
  * both ends of that contract with synthetic calibration pairs — the
  * out-of-sample recall itself is gated by SimilaritySpec (sf0.001
  * floors) and the multi-scale RecallProbe artifact.
  */
class CalibrationSpec extends AnyFunSuite {

  private val Dim = 64
  private val rnd = new scala.util.Random(20260814)

  private def randUnit(): Array[Double] = {
    val v = Array.fill(Dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** k random unit centroids, flattened row-major, ids 0..k-1. */
  private def centroids(k: Int): (Array[Double], Array[Long]) = {
    val unit = new Array[Double](k * Dim)
    for (c <- 0 until k) {
      val v = randUnit()
      System.arraycopy(v, 0, unit, c * Dim, Dim)
    }
    (unit, Array.tabulate(k)(_.toLong))
  }

  test("clustered pairs: IVF probes stay at the floor (cost adaptivity)") {
    val (unit, ids) = centroids(100)
    // Neighbor ≡ query: the neighbor's best cell IS the query's top cell,
    // so every minimal probe rank is 1 and nprobe collapses to the floor.
    val pairs = Array.fill(320) { val q = randUnit(); (q, q.clone) }
    val np = Similarity.calibratedNprobe(pairs, unit, ids)
    assert(np == 8, s"clustered corpus should probe the floor, got $np")
  }

  test("structureless pairs: IVF pays a large probe fraction for the target") {
    val (unit, ids) = centroids(100)
    // Independent random (near-orthogonal in 64-d) pairs: the neighbor's
    // cell rank in the query's order is ~uniform, so covering 95% of
    // neighbors (min of CellReplicas=2 uniform ranks) needs ~0.78k probes
    // before the sampling margin. The point: the calibrator must SAY so,
    // not hold a fixed sublinear coefficient and miss.
    val pairs = Array.fill(320) { (randUnit(), randUnit()) }
    val np = Similarity.calibratedNprobe(pairs, unit, ids)
    assert(np > 50 && np <= 100, s"hostile corpus demands a large nprobe, got $np")
  }

  test("empty pairs fall back to the round-8 rule") {
    val (unit, ids) = centroids(100)
    val np = Similarity.calibratedNprobe(Array.empty, unit, ids)
    assert(np == math.max(8, math.ceil(2.5 * math.sqrt(100)).toInt))
  }

  test("clustered pairs: LSH picks the minimal single-table config") {
    // Identical pairs hash identically in every table — hamming 0 — so
    // one table at depth 1 already has calibration recall 1.0 and is the
    // cheapest config by the candidate-count model.
    val pairs = Array.fill(320) { val q = randUnit(); (q, q.clone) }
    val (tables, depth) = Similarity.calibratedLsh(pairs, bits = 12)
    assert((tables, depth) == (1, 1),
      s"clustered corpus should get the cheapest config, got ($tables, $depth)")
  }

  test("structureless pairs: LSH escalates tables/depth instead of missing") {
    // Independent random pairs sit at expected hamming ≈ B/2 = 6: a
    // (1-table, depth-1) probe set has essentially zero calibration
    // recall, so the search must escalate well past it (or return the
    // best-recall in-cap config if nothing meets the target).
    val pairs = Array.fill(320) { (randUnit(), randUnit()) }
    val (tables, depth) = Similarity.calibratedLsh(pairs, bits = 12)
    assert(tables > 1 || depth > 1,
      s"hostile corpus must escalate the probe config, got ($tables, $depth)")
    assert(tables >= 1 && tables <= 16 && depth >= 1 && depth <= 3)
  }
}
