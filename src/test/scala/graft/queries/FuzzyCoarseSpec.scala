package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the fuzzy family's hot-bucket coarsening (round 16, VERDICT r15
  * #1) in miniature: a planted 80-doc identical cluster makes every fine
  * (band, bh) bucket exceed HotBucketOcc, so with the guard forced on
  * the candidate join runs through the coarse 4-row re-key path — and
  * must still produce EXACTLY the rows the fine path produces, because
  * J = 1.0 members agree on every coarse band and a cold near-dup pair
  * never routes through the hot path at all. The planted corpus is tiny,
  * so the shipped CoarseMinMass (8M raw join mass) must leave it cold —
  * asserted so the oracle-scale regime provably never coarsens.
  */
class FuzzyCoarseSpec extends SparkSuite {

  test("forced-on coarsening is row-identical to fine banding; shipped guard stays cold") {
    val sess = spark
    import sess.implicits._
    val cluster = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val other = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val docs = (
      // 80-doc identical cluster: ids 700..779 → 12 eval (% 7 == 0), 68
      // train; every fine bucket holds all 80 members (same signature).
      (700L to 779L).map(id => (id, cluster, "en", "web")) ++ Seq(
        // A cold near-dup eval/train pair on unrelated text.
        (7000L, other, "en", "web"),
        (7001L, other + " seventeen", "en", "web")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_coarse")
    try {
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // The hot census the coarse path routes on: every cluster bucket
      // must genuinely exceed HotBucketOcc, or the forced-on lap would
      // vacuously take the cold path and this spec would pin nothing.
      val sigs = Dedup.minhashSigs(Dedup.cappedShingles(spark, dir.toString))
        .filter(col("nsh") >= CorpusOps.MinCappedShingles)
        .select(col("doc_id"), col("sig"))
      val occ = Dedup.bucketsFromSigs(sigs, CorpusOps.FuzzyBandRows)
        .select(col("band"), col("bh"),
          (col("doc_id") % CorpusOps.EvalModulus === 0).as("is_eval"))
        .groupBy(col("band"), col("bh"))
        .agg(count_if(col("is_eval")).as("ne"), count_if(!col("is_eval")).as("nt"))
        .localCheckpoint()
      val hot = occ.filter(col("ne") + col("nt") > CorpusOps.HotBucketOcc).count()
      assert(hot >= CorpusOps.FuzzyBandRows * 16,
        s"planted cluster must make every fine bucket hot; got $hot hot buckets")
      // The adaptive guard's two arms, both exercised by this corpus: the
      // RELATIVE arm must flag it (the 80-doc identical cluster IS the
      // quadratic shape — mass/doc far past CoarsePairsPerDoc), while the
      // ABSOLUTE floor keeps a corpus this tiny cold at shipped defaults.
      val mass = occ.agg(sum(col("ne") * col("nt"))).head().getLong(0)
      val nSigned = sigs.count()
      assert(mass > CorpusOps.CoarsePairsPerDoc * nSigned,
        s"planted corpus must trip the relative arm: mass=$mass docs=$nSigned")
      assert(mass <= CorpusOps.CoarseMinMass,
        "planted corpus must sit under the absolute floor (shipped default cold)")

      def run(coarseMinMass: Long): Set[(Long, Long, Double)] =
        CorpusOps.decontaminateFuzzyCoarse(spark, dir.toString,
            CorpusOps.SketchCutMinPairs, coarseMinMass)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      val coarseOn = run(0L)
      val coarseOff = run(Long.MaxValue)
      assert(coarseOn == coarseOff,
        s"coarse re-key changed output: on-only=${(coarseOn -- coarseOff).take(5)} " +
          s"off-only=${(coarseOff -- coarseOn).take(5)}")
      // The cluster's bipartite pairs (12 eval × 68 train, J = 1.0) must
      // ALL survive the coarse path — identical docs share coarse keys.
      val clusterPairs = coarseOn.count {
        case (t, e, j) => t >= 700L && t <= 779L && e >= 700L && e <= 779L && j == 1.0
      }
      assert(clusterPairs == 12 * 68,
        s"expected all 816 identical-cluster pairs; got $clusterPairs")
      // The cold near-dup pair must be untouched by hot routing.
      assert(coarseOn.exists { case (t, e, _) => t == 7001L && e == 7000L },
        s"cold near-dup pair lost: ${coarseOn.filter(_._1 > 1000L)}")
    } finally Dedup.deleteDir(dir)
  }

  test("coarse guard is inert on every driver-verified corpus (sentinel)") {
    // Same discipline as the floor sentinels: the coarsening is lossy by
    // design in its activated regime and unstated in the oracle, so CI
    // pins that no verified corpus comes anywhere near EITHER arm of the
    // adaptive guard.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val sigs = Dedup.flooredSigs(Dedup.cappedShingles(spark, dir))
      val occ = Dedup.bucketsFromSigs(sigs, CorpusOps.FuzzyBandRows)
        .select(col("band"), col("bh"),
          (col("doc_id") % CorpusOps.EvalModulus === 0).as("is_eval"))
        .groupBy(col("band"), col("bh"))
        .agg(count_if(col("is_eval")).as("ne"), count_if(!col("is_eval")).as("nt"))
      val r = occ.agg(coalesce(sum(col("ne") * col("nt")), lit(0L)),
        coalesce(sum(col("ne") + col("nt")), lit(0L))).head()
      val mass = r.getLong(0)
      val docs = r.getLong(1) / (Dedup.NumPerms.toLong / CorpusOps.FuzzyBandRows)
      assert(mass <= CorpusOps.CoarseMinMass &&
          mass <= CorpusOps.CoarsePairsPerDoc * docs,
        s"$dir candidate mass $mass (docs=$docs) approaches the coarse " +
          "guard: the coarsening is no longer inert on a driver-verified " +
          "corpus — restate it in decontaminateFuzzySql before shipping")
    }
  }
}
