package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The composite training-corpus cleaning pipeline — the operators of this
  * engine chained the way a real pretraining ingest uses them:
  *
  *   0. line boilerplate removal (dd_lines, df ≥ 4 lines dropped; docs
  *      reduced to their surviving lines, fully-boilerplate docs drop) —
  *      FIRST, per dd_lines' own production-order contract: the
  *      license-header/cookie-banner skew bombs die here, which is what
  *      keeps the doc-level families' df caps from firing downstream,
  *      and every later stage (quality score, fingerprint, shingles)
  *      judges the CONTENT of a page rather than its chrome
  *   1. quality gate   (ta_quality score ≥ 0.55, on the CLEANED text)
  *   2. exact dedup    (normalization fingerprint; keep the BEST-QUALITY
  *                      member per fingerprint, ties → lowest doc_id)
  *   3. near-dup dedup (word-3-gram Jaccard ≥ 0.8 among survivors →
  *                      connected components → keep the BEST-QUALITY
  *                      member per cluster, ties → lowest doc_id)
  *
  * Stages 2 and 3 carry the PRODUCTION survivor policy — dd_keep_best's
  * quality-argmax (CCNet/RefinedWeb keep the best-scoring representative)
  * — composed into the flagship rather than the min-doc_id convenience
  * the standalone pair queries orient by (VERDICT r14 #2: a user running
  * "the pipeline" should get the policy dd_keep_best's Scaladoc calls
  * production). The tie-break makes the policy total: exact replicas
  * score identically, so ties fall back to the stable minimum id.
  *
  * Emits the surviving corpus with its provenance columns. Every stage is
  * the same logic as the standalone queries, so the whole chain is
  * SQL-expressible and oracle-checked end-to-end — the strongest
  * correctness statement in the suite, since stage-composition bugs
  * (dedup before/after filter, survivor policy, pair orientation) don't
  * show up in per-stage checks.
  */
object Pipeline {

  def cleanCorpus(spark: SparkSession, sfDir: String): DataFrame =
    projectOut(cleanSurvivorsFrom(Tables.documents(spark, sfDir)))

  /** The pipeline's output projection — provenance columns only, never
    * the survivor text (the text column is the corpus itself; the
    * pipeline's deliverable is WHICH docs survive and why).
    */
  private def projectOut(surv: DataFrame): DataFrame =
    surv.select(col("doc_id"), col("lang"), col("source"),
      col("quality_score"), col("fp"))

  /** Stages 0–3 with the survivor TEXT still attached — the shared chain
    * behind cleanCorpus (which projects it away) and cleanCorpusV2
    * (whose decontamination stage 4 shingles it). Parameterized on the
    * raw documents table so the stage-composition fixtures drive planted
    * corpora through the full chain.
    */
  private[graft] def cleanSurvivorsFrom(rawDocs: DataFrame): DataFrame = {
    // Stages 1+2 run ONCE: the survivor table is localCheckpoint'ed and
    // BOTH stage-3 branches (the shingle basis feeding the LSH funnel and
    // the anti-join base emitting the output) derive from the checkpoint.
    // Round 5 built each branch from its own exactKept call — two full
    // corpus scans and two fp-window shuffles per run; at 100 TB that
    // doubles the quality-gate + exact-dedup cost of the flagship
    // pipeline. The checkpoint is the survivor corpus (text included,
    // which stage 3 shingles) — exactly the intermediate table a real
    // ingest pipeline materializes between its dedup passes; PlanSpec
    // gates that the final plan reads no parquet at all and that the
    // stage-1+2 subtree scans `documents` exactly once.
    // Lazy (round 19): the funnel's capped-basis count is the
    // materializing action (a single scan of this relation) — the eager
    // form paid a separate materialization job first.
    val kept = exactKeptFrom(rawDocs).localCheckpoint(eager = false)

    // Stage 3: near-dup dedup among survivors under the keep-best policy.
    // Candidate pairs come from the dd_minhash funnel (banded LSH
    // candidates → df-capped exact verification), NOT the exact shingle
    // self-join: identical output at J ≥ 0.8 (candidates are
    // exact-verified; P(miss) ≈ 2e-4 — same reroute argument as
    // dd_editdist), but candidate generation stays hash-join-shaped at
    // corpus scale instead of quadratic in shingle-sharing docs. The
    // oracle states the exact form, so the equivalence is hash-checked
    // end-to-end every round, and PipelineEquivalenceSpec re-proves
    // minhashFrom ≡ jaccardPairs on THIS survivor set (not just the raw
    // corpus) so threshold-adjacent drift in the survivors can't silently
    // void the reroute argument.
    //
    // Pair orientation alone can't express keep-best (the best member of
    // a chain may sit mid-id), so the pairs close into components via
    // dd_clusters' propagation loop and each cluster keeps its quality
    // argmax — dd_keep_best's partial-aggregable max(struct(q, -id)):
    // only #clusters rows cross the exchange, never a window over the
    // clustered rows. Quality rides in from the checkpointed survivor
    // table (computed once at stage 1 — no second documents scan).
    val pairs = Dedup.minhashFrom(shinglesOf(kept))
      .select(col("doc_a"), col("doc_b"))
    val labeled = Dedup.propagateComponents(pairs)
      .localCheckpoint(eager = false) // its own count below materializes
    val best = labeled
      .join(kept.select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("quality_score").as("q"),
        (-col("doc_id")).as("nd"))).as("b"))
      .select(col("cluster_id"), (-col("b.nd")).as("keep_id"))
    // Losers = clustered docs that are not their cluster's keeper. Both
    // attaches are guarded (labeled is checkpointed, so its count is a
    // cached-block read; kept's count keys the final anti-join) — the
    // survivor corpus, the stream carrying full text, is never sorted in
    // either guard regime.
    val losers = labeled
      .join(Dedup.attachGuard(labeled.count())(best), Seq("cluster_id"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))

    kept.join(Dedup.attachGuard(kept.count())(losers), Seq("doc_id"), "left_anti")
  }

  /** pipeline_v2 — the flagship with the eval-set DECONTAMINATION pass
    * composed in (round 19, VERDICT r18 #4): every production
    * pretraining ingest runs one (GPT-3 appendix C, Gopher §A.4), and
    * the engine already shipped it standalone (dd_decontaminate /
    * dd_decontaminate_fuzzy, both oracle-green) — this entry is the
    * composed form. Stage 4, after lines → quality → exact → near-dup:
    *
    *   - the eval benchmark stand-in is the doc_id % 7 = 0 subset
    *     (dd_decontaminate's convention), read at its RAW text — the
    *     benchmark is external data; the pipeline's cleaning never
    *     applies to it;
    *   - a TRAIN survivor is dropped when it shares ANY 8-gram with any
    *     eval doc, grams df-capped on the combined corpus exactly like
    *     dd_decontaminate (cap inert at every oracle scale — the oracle
    *     states the uncapped form);
    *   - eval-member rows themselves are dropped from the output: the
    *     benchmark is never training data (a crawled copy of an eval
    *     doc is the degenerate self-overlap case of the same rule);
    *   - train-side grams come from the CLEANED survivor text — the
    *     text that would actually train is what contamination is
    *     measured on.
    *
    * Order: decontamination runs LAST deliberately — the bipartite gram
    * join then touches the deduplicated survivor corpus instead of the
    * raw crawl (the cheap order at 100 TB), and the quality/dedup
    * stages never see the benchmark rows removed early (dedup decisions
    * stay identical to pipeline_clean_corpus, so the two entries'
    * outputs are relatable by construction — the composition spec pins
    * exactly that). Fully SQL-expressible; the oracle extends the
    * flagship's CTE chain end-to-end.
    */
  def cleanCorpusV2(spark: SparkSession, sfDir: String): DataFrame =
    cleanCorpusV2From(Tables.documents(spark, sfDir))

  private[graft] def cleanCorpusV2From(rawDocs: DataFrame): DataFrame = {
    // Checkpoint: stage 4 consumes the survivors TWICE (gram basis +
    // output anti-join base) — without it the whole stage-0–3 chain
    // would replay per consumer (the exactKept lesson, round 5).
    // Lazy: trainSurv.count() (the stage-4 attach guard) materializes.
    val surv = cleanSurvivorsFrom(rawDocs).localCheckpoint(eager = false)
    // 8-grams hash-compacted before the distinct (the dd_decontaminate
    // rationale): grams are internal — only overlap membership reaches
    // the output — so df cap, anti-joins, and the bipartite semi-join
    // run on 8 B longs.
    val gram8 = (df: DataFrame) => df.select(col("doc_id"),
        explode(graft.functions.WordShingles.wordShingles(col("text"), 8)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gram"))
      .distinct()
    val evalGrams = gram8(
      rawDocs.filter(col("doc_id") % CorpusOps.EvalModulus === 0)
        .select(col("doc_id"), col("text")))
    val trainSurv = surv.filter(col("doc_id") % CorpusOps.EvalModulus =!= 0)
    val trainGrams = gram8(trainSurv)
    // Hot on either side → capped on the COMBINED df before the
    // bipartite join (dd_decontaminate's rule: per-key join output is
    // df_eval · df_train, so a boilerplate gram must be capped wherever
    // it is hot; a df-1000+ gram carries no contamination signal).
    val hot = evalGrams.unionByName(trainGrams)
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") > CorpusOps.EvalGramDfCap).select(col("gram"))
    val contaminated = trainGrams.join(broadcast(hot), Seq("gram"), "left_anti")
      .join(evalGrams.join(broadcast(hot), Seq("gram"), "left_anti")
        .select(col("gram")), Seq("gram"), "left_semi")
      .select(col("doc_id")).distinct()
    projectOut(trainSurv.join(
      Dedup.attachGuard(trainSurv.count())(contaminated),
      Seq("doc_id"), "left_anti"))
  }

  /** Stages 1+2 (quality gate, exact dedup) — the survivor corpus stage 3
    * deduplicates. Package-visible so the equivalence spec runs the LSH
    * funnel and the exact self-join over the same survivor basis.
    */
  private[graft] def exactKept(spark: SparkSession, sfDir: String): DataFrame =
    exactKeptFrom(Tables.documents(spark, sfDir))

  /** Stages 0–2 parameterized on the raw documents table, so the planted
    * keep-best fixture (PipelineEquivalenceSpec) can drive the survivor
    * policy on a corpus where best-quality provably diverges from min-id
    * — at oracle scale every post-gate fingerprint group is a singleton,
    * so the driver hash can't distinguish the two policies at stage 2
    * (stage 3 it can: 10 of 23 cluster keepers are non-minimal at
    * sf0.01).
    */
  private[graft] def exactKeptFrom(rawDocs: DataFrame): DataFrame = {
    // Stage 0: line-level boilerplate removal (the dd_lines pass in its
    // pipeline-composable form — pass-through columns ride the explode,
    // fully-boilerplate docs drop, ONE documents scan in the plan; the
    // hot-set size guard's count job runs ahead of the main pass exactly
    // as in standalone dd_lines). On the driver corpora (single-line
    // docs, max line df 2 < 4) this is a verified no-op — the planted
    // fixture spec and the oracle CTE carry the behavioral check.
    val docs = Dedup.lineCleanedDocs(rawDocs, Seq("lang", "source"))

    // Stage 1: quality gate (subset of ta_quality's score formula).
    val toks = split(col("text"), "\\s+")
    val nTok = size(toks).cast("double")
    val alphaRatio = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
      length(col("text")).cast("double")
    val stopRatio = size(filter(toks, t => t.isin("a", "the", "of", "and", "to")))
      .cast("double") / nTok
    val score = lit(0.4) * alphaRatio + lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.3) * least(lit(1.0), nTok / lit(100.0))
    val quality = docs
      .withColumn("quality_score", round(score, 4))
      .filter(col("quality_score") >= 0.55)

    // Stage 2: exact dedup — keep-best within each fingerprint group:
    // the fp normalizes case and non-letters, so two docs can share a
    // fingerprint while scoring differently on their RAW text; the
    // production policy keeps the best-scoring one (ties → lowest
    // doc_id, via the same max(struct(q, -id)) device as dd_keep_best).
    // Same single-window shuffle shape as the previous min-id form —
    // the struct max replaces the min, nothing else moves.
    val fp = md5(regexp_replace(lower(col("text")), "[^a-z]", ""))
    quality
      .withColumn("fp", fp)
      .withColumn("bst", max(struct(col("quality_score").as("q"),
          (-col("doc_id")).as("nd")))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === -col("bst.nd"))
      .drop("bst")
  }

  /** Distinct word-3-gram shingles of a survivor table — the stage-3
    * dedup basis, parameterized on the table so cleanCorpus feeds it the
    * checkpointed survivors instead of recomputing them.
    */
  private[graft] def shinglesOf(kept: DataFrame): DataFrame =
    // Hash-compacted BEFORE the distinct (round 19, the hashedShingles
    // rationale): the basis exchange and aggregate carry 8 B longs, not
    // shingle strings — minhashFrom compacts anyway, so the string form
    // never needs to exist past the projection. Set-identical absent
    // xxhash64 collisions (BasisFloorSpec's sentinel).
    kept.select(col("doc_id"),
        explode(graft.functions.WordShingles.wordShingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("shingle"))
      .distinct()

  /** The stage-3 dedup basis from scratch — used by the equivalence spec,
    * which needs the survivor shingles without the checkpoint boundary.
    */
  private[queries] def survivorShingles(spark: SparkSession, sfDir: String): DataFrame =
    shinglesOf(exactKept(spark, sfDir))

  /** The stage-0–3 CTE chain, shared by both pipeline oracles (the
    * `survivors` CTE is cleanSurvivorsFrom restated).
    */
  private val pipelineCtesSql: String =
    raw"""WITH RECURSIVE ln AS (
         |  SELECT doc_id, lang, source, i - 1 AS idx, l[i] AS line
         |  FROM (SELECT doc_id, lang, source,
         |          regexp_split_to_array(text, chr(10)) AS l
         |        FROM documents)
         |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),
         |lndf AS (SELECT line, count(DISTINCT doc_id) AS df FROM ln GROUP BY 1),
         |cleaned AS (
         |  SELECT doc_id, lang, source,
         |    string_agg(line, chr(10) ORDER BY idx) AS text
         |  FROM ln JOIN lndf USING (line)
         |  WHERE df < ${Dedup.LineBoilerplateDf}
         |  GROUP BY 1, 2, 3),
         |quality AS (
         |  SELECT doc_id, lang, source, text,
         |    round(0.4 * (length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text))
         |      + 0.3 * (1.0 - len(list_filter(regexp_split_to_array(text, '\s+'),
         |          t -> t IN ('a','the','of','and','to'))) * 1.0
         |          / len(regexp_split_to_array(text, '\s+')))
         |      + 0.3 * least(1.0, len(regexp_split_to_array(text, '\s+')) / 100.0), 4)
         |      AS quality_score
         |  FROM cleaned),
         |gated AS (SELECT * FROM quality WHERE quality_score >= 0.55),
         |exact_kept AS (
         |  SELECT *, md5(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS fp
         |  FROM gated
         |  QUALIFY row_number() OVER (
         |    PARTITION BY md5(regexp_replace(lower(text), '[^a-z]', '', 'g'))
         |    ORDER BY quality_score DESC, doc_id) = 1),
         |tok AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM exact_kept
         |  WHERE len(regexp_split_to_array(text, '\s+')) >= 3),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |            for i in generate_series(1, len(w)-2)]) AS shingle
         |  FROM tok),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sizes sa ON p.doc_a = sa.doc_id
         |  JOIN sizes sb ON p.doc_b = sb.doc_id
         |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
         |edges AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc_id, r) AS (
         |  SELECT doc_a, doc_a FROM edges
         |  UNION
         |  SELECT e.doc_b, r.r FROM reach r JOIN edges e ON e.doc_a = r.doc_id),
         |labeled AS (
         |  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |keepers AS (
         |  SELECT l.cluster_id, l.doc_id AS keep_id FROM labeled l
         |  JOIN exact_kept e USING (doc_id)
         |  QUALIFY row_number() OVER (PARTITION BY l.cluster_id
         |    ORDER BY e.quality_score DESC, l.doc_id) = 1),
         |losers AS (
         |  SELECT l.doc_id FROM labeled l
         |  JOIN keepers k ON l.cluster_id = k.cluster_id
         |  WHERE l.doc_id <> k.keep_id),
         |survivors AS (
         |  SELECT * FROM exact_kept
         |  WHERE doc_id NOT IN (SELECT doc_id FROM losers))""".stripMargin

  val cleanCorpusSql: String =
    s"""$pipelineCtesSql
       |SELECT doc_id, lang, source, quality_score, fp
       |FROM survivors""".stripMargin

  /** pipeline_v2's oracle: the flagship CTE chain extended with the
    * decontamination stage — eval 8-grams over RAW documents text, train
    * 8-grams over the CLEANED survivor text, overlap drops the train doc,
    * eval-member rows never reach the output. The df cap is not restated
    * (inert at every oracle scale — the dd_decontaminate argument).
    */
  val cleanCorpusV2Sql: String =
    raw"""$pipelineCtesSql,
         |evtok AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents
         |  WHERE doc_id % ${CorpusOps.EvalModulus} = 0
         |    AND len(regexp_split_to_array(text, '\s+')) >= 8),
         |ev8 AS (
         |  SELECT DISTINCT doc_id,
         |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         |            w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
         |            for i in generate_series(1, len(w)-7)]) AS gram
         |  FROM evtok),
         |trtok AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM survivors
         |  WHERE doc_id % ${CorpusOps.EvalModulus} != 0
         |    AND len(regexp_split_to_array(text, '\s+')) >= 8),
         |tr8 AS (
         |  SELECT DISTINCT doc_id,
         |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         |            w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
         |            for i in generate_series(1, len(w)-7)]) AS gram
         |  FROM trtok),
         |contaminated AS (
         |  SELECT DISTINCT t.doc_id FROM tr8 t JOIN ev8 e USING (gram))
         |SELECT doc_id, lang, source, quality_score, fp
         |FROM survivors
         |WHERE doc_id % ${CorpusOps.EvalModulus} != 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin
}
