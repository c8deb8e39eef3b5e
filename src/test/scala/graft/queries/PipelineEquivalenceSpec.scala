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

  test("stage-2 keeps the best-quality member per fingerprint, not min id") {
    // Planted pair sharing one normalization fingerprint (identical
    // letters-only-lowercase text) where the HIGHER id scores higher:
    // doc 10's title-casing lowers its [a-z] alpha ratio more than its
    // zero stopword ratio buys back ("The" ≠ "the" for the stoplist).
    // The old min-id policy kept doc 10; keep-best must keep doc 11.
    // At oracle scale this stage is vacuously policy-free (every
    // post-gate fp group is a singleton at sf0.01), so THIS fixture is
    // the stage-2 policy's behavioral check; stage 3's policy is
    // driver-hash-checked (10 of 23 keepers non-minimal at sf0.01).
    import spark.implicits._
    val docs = Seq(
      (10L, "The Quick Brown Fox Jumps Over The Lazy Dog", "en", "web"),
      (11L, "the quick brown fox jumps over the lazy dog", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val kept = Pipeline.exactKeptFrom(docs)
      .select("doc_id", "quality_score").collect()
    // Premise: one fp group, both pass the gate, 11 outscores 10 — if a
    // formula tweak breaks the premise the assert explains itself.
    val solo = docs.collect().map { r =>
      val one = Pipeline.exactKeptFrom(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") === r.getLong(0)))
        .select("doc_id", "quality_score").collect()
      assert(one.length == 1, s"doc ${r.getLong(0)} must pass the gate alone")
      one(0).getLong(0) -> one(0).getDouble(1)
    }.toMap
    assert(solo(11L) > solo(10L),
      s"premise: 11 must outscore 10 (got $solo) — formula drifted?")
    val byId = kept.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kept.length == 1,
      s"expected one survivor from the shared-fp pair, got ${byId.keySet}")
    assert(byId.keySet == Set(11L),
      s"keep-best must keep the best-quality member (11), kept ${byId.keySet}")
  }
}
