package graft.queries

import graft.SparkSuite

/** pipeline_clean_corpus's stage 3 runs the banded-LSH minhash funnel while
  * its oracle states the exact shingle self-join; the equivalence is
  * probabilistic (P(miss) ≈ 2e-4 per borderline J≈0.8 pair). CapBindingSpec
  * proves the equivalence on a planted corpus and the driver hash-checks it
  * end-to-end at sf0.01 — this spec re-proves it directly on the pipeline's
  * ACTUAL SURVIVOR SET, so drift in the upstream stages (a quality-gate
  * tweak admitting many threshold-adjacent pairs, an exact-dedup change
  * shifting the basis) is caught here as "funnel diverged", not downstream
  * as an unexplained oracle flake.
  */
class PipelineEquivalenceSpec extends SparkSuite {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("stage-3 LSH funnel ≡ exact self-join on the pipeline survivor set") {
    // One materialization, both forms read it: the comparison must see the
    // identical survivor basis, not two recomputations.
    val sh = Pipeline.survivorShingles(spark, sf).localCheckpoint()
    val funnel = pairSet(Dedup.minhashFrom(sh))
    val exact = pairSet(Dedup.jaccardPairs(sh, 0.8))
    assert(funnel == exact,
      s"LSH funnel diverged from the exact self-join on the survivor set:\n" +
        s" funnel-only=${funnel -- exact}\n exact-only=${exact -- funnel}")
    // The comparison is vacuous if the survivor set has no near-dup pairs —
    // the corpus plants near-dups that pass the quality gate, so a sudden
    // empty pair set means the basis changed, not that the proof got easier.
    assert(exact.nonEmpty, "survivor set has no near-dup pairs to compare on")
  }
}
