package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stage-composition checks for pipeline_v2 (round 19, VERDICT r18 #4):
  * the flagship with the eval-set decontamination pass composed in. The
  * per-stage logic is dd_decontaminate's (own spec + oracle); what only
  * a COMPOSITION test can catch is the wiring — which text each side
  * shingles (raw eval vs CLEANED train), which rows reach the output
  * (no eval members, no overlapping train docs), and that stages 0–3
  * stay exactly pipeline_clean_corpus's (decontamination last, so dedup
  * decisions are unchanged).
  */
class PipelineV2Spec extends SparkSuite {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("planted composition: overlapping train doc and eval members drop; clean train doc survives") {
    val sess = spark
    import sess.implicits._
    // All docs pass the quality gate (lowercase word salad, ≥ 8 tokens),
    // share no fingerprints and no 3-gram Jaccard ≥ 0.8 pairs — stages
    // 0–3 are pass-throughs, isolating stage 4.
    //   7  — eval member (id % 7 = 0)
    //  15  — train doc sharing a verbatim 8-gram with doc 7 → dropped
    //  16  — clean train doc → survives
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val overlap = "prefix words here alpha beta gamma delta epsilon zeta eta theta trailing salt"
    val clean = "completely different vocabulary without any shared octets rolling onward nicely"
    val docs = Seq(
      (7L, evalText, "en", "web"),
      (15L, overlap, "en", "web"),
      (16L, clean, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    // Premise: all three survive stages 0–3 (else the fixture tests
    // nothing — assert it explicitly so a gate tweak explains itself).
    assert(ids(Pipeline.cleanSurvivorsFrom(docs)) == Set(7L, 15L, 16L),
      "fixture premise: all docs must survive stages 0-3")
    assert(ids(Pipeline.cleanCorpusV2From(docs)) == Set(16L),
      "stage 4 must drop the eval member (7) and the overlapping train " +
        "doc (15), keep the clean train doc (16)")
  }

  test("train side shingles the CLEANED text: a line-boilerplate 8-gram cannot contaminate") {
    val sess = spark
    import sess.implicits._
    // The contaminating 8-gram lives ONLY in a boilerplate line (df ≥ 4
    // across docs) of the train doc — stage 0 strips it before stage 4
    // shingles the survivor text, so the doc must NOT be dropped. If
    // stage 4 mistakenly shingled the RAW train text, it would be.
    val banner = "this content is served under the standard license banner"
    // Letter-distinct salts: the stage-2 fingerprint strips digits, so a
    // numeric-only difference would collapse the train docs into one fp.
    val saltWords = Seq("one", "two", "three", "four")
    def salt(i: Int) =
      s"unique filler number ${saltWords(i - 1)} with plenty of ordinary words marching along"
    val docs = (
      // Four train docs carrying the banner line (df 4 ≥ LineBoilerplateDf).
      (1 to 4).map(i => ((i * 7 + 1).toLong, s"$banner\n${salt(i)}", "en", "web")) :+
      // The eval doc contains the banner 8-grams at RAW text.
      ((7L, s"$banner extra eval only words", "en", "web")))
      .toDF("doc_id", "text", "lang", "source")
    val out = ids(Pipeline.cleanCorpusV2From(docs))
    val expectedTrain = (1 to 4).map(i => (i * 7 + 1).toLong).toSet
    assert(out == expectedTrain,
      s"banner grams live only in stripped boilerplate lines - train docs " +
        s"must survive decontamination against the raw eval text, got $out")
  }

  test("on the driver corpus: v2 = flagship survivors minus eval members minus brute-forced overlaps") {
    // Reference computed independently: collect the flagship survivor
    // texts (cleaned) + raw eval texts, brute-force the 8-gram overlap
    // on the driver. Ties v2's distributed funnel to first principles
    // on a real corpus, not only on planted fixtures.
    val docs = graft.Tables.documents(spark, sf)
    val surv = Pipeline.cleanSurvivorsFrom(docs).localCheckpoint()
    def grams8(t: String): Set[String] = {
      val w = t.split("\\s+")
      if (w.length < 8) Set.empty
      else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val evalG = docs.filter(col("doc_id") % 7 === 0)
      .select("doc_id", "text").collect()
      .flatMap(r => grams8(r.getString(1))).toSet
    val trainSurv = surv.filter(col("doc_id") % 7 =!= 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> grams8(r.getString(1)))
    val expected = trainSurv.filter(_._2.intersect(evalG).isEmpty).map(_._1).toSet
    val got = ids(Pipeline.cleanCorpusV2(spark, sf))
    assert(got == expected,
      s"v2 diverged from the brute-forced reference: " +
        s"extra=${got -- expected} missing=${expected -- got}")
    // Non-vacuity: the corpus must exercise both drop classes.
    assert(trainSurv.exists(_._2.intersect(evalG).nonEmpty),
      "corpus premise: at least one train survivor must overlap the eval set")
    assert(ids(surv).exists(_ % 7 == 0),
      "corpus premise: at least one eval member must survive stages 0-3")
  }
}
