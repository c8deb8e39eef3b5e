package graft.queries

import graft.SparkSuite

/** Pins the round-15 dynamic-oracle contract: the approximate-ANN family's
  * DuckDB restatements (frozen index artifacts inlined as literals, every
  * distributed search stage recomputed in SQL — see
  * Similarity.oracleSqlDynamic). The actual hash compare is the driver's
  * gate (and scripts/check_oracles.py locally — green at sf0.001/0.01/0.1
  * this round); what a unit spec can and should pin is the REGISTRY shape:
  * which entries are dynamic, that generation is deterministic, and that
  * the union of static + dynamic oracles covers every queries() entry —
  * the "every operator has a driver-checkable correctness row" bar.
  */
class AnnOracleSpec extends SparkSuite {

  private val dynamicNames = Set(
    "ann_ivf", "ann_ivf_kmeans", "ann_ivf_pq", "ann_lsh",
    "ann_ivf_append", "ann_filtered", "ann_filtered_rare",
    "ann_filtered_range",
    // round 19: the staged serving form shares ann_ivf's restatement —
    // staged ≡ recompute is hash-proven by the driver gate per round.
    "ann_ivf_staged")

  test("dynamic oracles cover exactly the approximate-ANN family") {
    val dyn = graft.SparkEntry.dynamicOracleSql(spark, sf)
    assert(dyn.keySet == dynamicNames)
    // No shadowing: a dynamic entry must not also carry a static oracle
    // (Verify's merge would silently prefer the dynamic one).
    assert(graft.SparkEntry.oracleSql.keySet.intersect(dynamicNames).isEmpty)
  }

  test("static + dynamic oracles cover the full query registry") {
    val covered = graft.SparkEntry.oracleSql.keySet ++ dynamicNames
    val missing = graft.SparkEntry.queries.keySet -- covered
    assert(missing.isEmpty,
      s"queries without any oracle (rows-only in the driver gate): $missing")
  }

  test("generation is deterministic per corpus") {
    val a = graft.SparkEntry.dynamicOracleSql(spark, sf)
    val b = graft.SparkEntry.dynamicOracleSql(spark, sf)
    assert(a == b)
  }

  test("restated stages are present in the generated SQL") {
    val dyn = graft.SparkEntry.dynamicOracleSql(spark, sf)
    // Every IVF-shaped oracle restates assignment + probing + the exact
    // re-rank; PQ adds encode/ADC/shortlist; LSH the hamming-ball join.
    for (n <- Seq("ann_ivf", "ann_ivf_kmeans", "ann_ivf_append",
        "ann_filtered", "ann_filtered_rare")) {
      val s = dyn(n)
      assert(s.contains("cents(cid, cvec)") && s.contains("assigned") &&
        s.contains("probed") && s.contains("list_cosine_similarity"), n)
    }
    assert(dyn("ann_filtered").contains("WHERE e.label = 3"))
    assert(dyn("ann_filtered_rare").contains("e.vec_id % 10 = 1"))
    val pq = dyn("ann_ivf_pq")
    assert(pq.contains("codes") && pq.contains("shortlist") &&
      pq.contains("list_slice"))
    val lsh = dyn("ann_lsh")
    assert(lsh.contains("planes(tbl, b, pvec)") &&
      lsh.contains("bit_count(xor("))
  }
}
