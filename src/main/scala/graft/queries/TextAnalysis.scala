package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline, over `documents`.
  *
  * All four are pure column expressions (higher-order functions, no UDFs),
  * so they stay inside WholeStageCodegen and scale linearly with the scan:
  * no shuffle at all — per-document metrics are embarrassingly parallel.
  */
object TextAnalysis {

  /** ta_tokens — whitespace token count + BPE-ish subword-unit count.
    * The BPE-ish regex splits letter runs, digit runs, and single
    * punctuation marks — the pre-tokenization step of byte-pair encoders.
    */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"), lit(0))).cast("long").as("n_bpe_tokens"))

  val tokensSql: String =
    raw"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_bpe_tokens
         |FROM documents""".stripMargin

  /** ta_quality — length/alpha/stopword heuristics blended into one score,
    * the standard cheap pre-filter before expensive dedup/model scoring.
    */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin("a", "the", "of", "and", "to")))
      .cast("double")
    val alphaChars = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
    val alphaRatio = alphaChars / length(col("text")).cast("double")
    val stopRatio = nStop / nTok
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok, 4)
        .as("mean_token_len"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(lit(0.4) * alphaRatio + lit(0.3) * (lit(1.0) - stopRatio)
        + lit(0.3) * least(lit(1.0), nTok / lit(100.0)), 4).as("quality_score"))
  }

  val qualitySql: String =
    raw"""SELECT doc_id, n_chars,
         |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
         |  round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
         |    / len(regexp_split_to_array(text, '\s+')), 4) AS mean_token_len,
         |  round(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text), 4) AS alpha_ratio,
         |  round(len(list_filter(regexp_split_to_array(text, '\s+'),
         |    t -> t IN ('a','the','of','and','to'))) * 1.0
         |    / len(regexp_split_to_array(text, '\s+')), 4) AS stopword_ratio,
         |  round(0.4 * (length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text))
         |    + 0.3 * (1.0 - len(list_filter(regexp_split_to_array(text, '\s+'),
         |        t -> t IN ('a','the','of','and','to'))) * 1.0
         |        / len(regexp_split_to_array(text, '\s+')))
         |    + 0.3 * least(1.0, len(regexp_split_to_array(text, '\s+')) / 100.0), 4) AS quality_score
         |FROM documents""".stripMargin

  /** ta_langid — stopword-overlap language heuristic. Ratio of tokens
    * hitting each language's tiny stopword list; argmax with a fixed
    * tie-break order, 'und' when nothing matches. Expressed as pure column
    * arithmetic so the same logic is stated verbatim in the oracle SQL.
    */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una"))

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    // Tokenize ONCE via explode + conditional aggregation — all codegen'd
    // hash-agg (interpreted filter() lambdas ×4 languages measured ~6×
    // slower at sf0.1). Partial aggregation collapses each doc's tokens
    // before any shuffle, so shuffle volume is O(docs), not O(tokens).
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
    val hitAggs = stopwords.map { case (lang, ws) =>
      sum(when(col("tok").isin(ws: _*), 1).otherwise(0)).cast("double").as(s"h_$lang")
    }
    val agged = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("n"), hitAggs: _*)
    val rs = stopwords.map { case (lang, _) => lang -> col(s"h_$lang") / col("n") }
    val detected = rs.foldRight(lit("und")) { case ((lang, r), rest) =>
      val isMax = rs.filter(_._1 != lang).map(o => r >= o._2).reduce(_ && _)
      when(r > 0 && isMax, lit(lang)).otherwise(rest)
    }
    agged.select(
      col("doc_id"),
      detected.as("detected_lang"),
      round(greatest(rs.map(_._2): _*), 4).as("confidence"))
  }

  val langIdSql: String = {
    def r(ws: Seq[String]): String =
      s"len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t IN (${ws.map("'" + _ + "'").mkString(",")}))) * 1.0 / len(regexp_split_to_array(text, '\\s+'))"
    val ratios = stopwords.map { case (l, ws) => l -> r(ws) }.toMap
    val cases = Seq("en", "de", "fr", "es").map { l =>
      val others = ratios.filter(_._1 != l).values.map(o => s"${ratios(l)} >= $o").mkString(" AND ")
      s"WHEN ${ratios(l)} > 0 AND $others THEN '$l'"
    }.mkString("\n    ")
    s"""SELECT doc_id,
       |  CASE $cases ELSE 'und' END AS detected_lang,
       |  round(greatest(${ratios.values.mkString(", ")}), 4) AS confidence
       |FROM documents""".stripMargin
  }

  /** ta_charngrams — per-language character-trigram profile: the top-5
    * most frequent char 3-grams per lang label (the feature a real n-gram
    * language identifier trains on; ta_langid's stopword heuristic is its
    * cheap runtime form). Explode → count → rank: shuffle volume is
    * O(distinct trigrams) thanks to partial aggregation.
    */
  def charNgrams(spark: SparkSession, sfDir: String): DataFrame = {
    val tri = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(graft.functions.CharShingles.charShingles(col("text"), 3))
          .as("trigram"))
    val counts = tri.groupBy(col("lang"), col("trigram"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("trigram"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("trigram"), col("n"))
  }

  val charNgramsSql: String =
    raw"""SELECT lang, rnk, trigram, n FROM (
         |  SELECT lang, trigram, n,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, trigram) AS INT) AS rnk
         |  FROM (
         |    SELECT lang, trigram, count(*) AS n FROM (
         |      SELECT lang,
         |        unnest([text[i:i+2] for i in generate_series(1, length(text)-2)]) AS trigram
         |      FROM documents) g
         |    GROUP BY 1, 2) c) t
         |WHERE rnk <= 5""".stripMargin

  /** ta_winnow — winnowing document fingerprints (Schleimer et al., the
    * rolling-hash fingerprint scheme MOSS uses): hash every k-char gram,
    * slide a w-position window, keep each window's minimum — a document's
    * fingerprint set is robust to local edits. Emitted here as a per-doc
    * summary (count + xor + min of the selected hashes). Gram hash is the
    * sign-masked md5 low-64 both engines share (Md5Long64), so the whole
    * pass — including the exact fingerprint VALUES the summary folds —
    * is restated in oracle SQL; TextAnalysisSpec additionally asserts
    * determinism and that near-duplicate docs overlap far more than
    * random pairs.
    */
  def winnow(spark: SparkSession, sfDir: String): DataFrame = {
    val K = 8 // k-gram length in chars
    val W = 4 // winnow window in positions
    // The whole winnowing pass (hash → window-min → distinct) runs inside
    // the row via a codegen expression: no posexplode, no per-doc Window,
    // no shuffle at all — the per-doc summary is a pure projection over
    // the already-distinct fingerprint array. (The old explode+Window form
    // shuffled one row per character position; see WinnowFingerprints.)
    val fps = graft.functions.WinnowFingerprints
      .winnowFingerprints(col("text"), K, W)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), fps.as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        aggregate(col("fps"), lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("fp_xor"))
  }

  /** Oracle: per-doc count/min/xor over the DuckDB-rebuilt fingerprint
    * sets (Dedup.winnowFragmentSql — the shared winnow restatement).
    * bit_xor over the 63-bit masked values stays in BIGINT range, so the
    * fold is value-exact, not just cardinality-exact.
    */
  val winnowSql: String =
    s"""WITH ${Dedup.winnowFragmentSql}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
       |  min(wmin) AS fp_min, bit_xor(wmin) AS fp_xor
       |FROM wm GROUP BY doc_id""".stripMargin

  /** Fingerprint sets per doc — used by dd_winnow and the overlap spec.
    * The expression already dedupes per doc, so explode emits exactly the
    * distinct (doc_id, wmin) pairs with no window and no distinct shuffle.
    */
  def winnowSets(spark: SparkSession, sfDir: String): DataFrame = {
    val K = 8; val W = 4
    // Winnowing hashes one md5 per code point (the 40×-the-scan-bytes
    // class dd_substring documents), and a test corpus arrives as ONE
    // parquet split — without a spread every consumer of this subtree
    // (dd_winnow's df aggregate AND its anti-join stream; ta_winnow's
    // rollup) re-runs the fingerprint pass on one core (JobBreakdown:
    // 316 + 432 ms single-task jobs inside dd_winnow's 1.7 s wall).
    // Hash-spread on doc_id — deterministic, inert at production split
    // counts (the dd_substring single-split rationale).
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val spread =
      if (docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        docs.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      else docs
    spread
      .select(col("doc_id"),
        explode(graft.functions.WinnowFingerprints
          .winnowFingerprints(col("text"), K, W)).as("wmin"))
  }

  /** ta_profile — column-level data profiling of the documents table:
    * null/distinct/extremes per column in ONE scan (every stat is an
    * algebraic aggregate, so this is a single partial+final hash agg
    * regardless of table size — the standard pre-ingest quality gate).
    */
  def profile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      count(col("text")).as("text_nonnull"),
      countDistinct(col("lang")).as("lang_distinct"),
      countDistinct(col("source")).as("source_distinct"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      round(avg(col("n_chars")), 4).as("avg_chars"),
      min(length(col("text"))).as("min_len"),
      max(length(col("text"))).as("max_len"))

  val profileSql: String =
    """SELECT count(*) AS n_rows,
      |  count(text) AS text_nonnull,
      |  count(DISTINCT lang) AS lang_distinct,
      |  count(DISTINCT source) AS source_distinct,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  round(avg(n_chars), 4) AS avg_chars,
      |  CAST(min(length(text)) AS INT) AS min_len,
      |  CAST(max(length(text)) AS INT) AS max_len
      |FROM documents""".stripMargin

  /** ta_fingerprint — content fingerprint: md5 over the letters-only
    * normalization (case/punct/whitespace-insensitive identity). This is
    * the join key for exact dedup at any scale — 16 bytes per doc.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "[^a-z]", "")).as("fp_md5"),
      substring(md5(regexp_replace(lower(col("text")), "[^a-z]", "")), 1, 8)
        .as("fp_prefix"))

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS fp_md5,
      |  substr(md5(regexp_replace(lower(text), '[^a-z]', '', 'g')), 1, 8) AS fp_prefix
      |FROM documents""".stripMargin

  /** The scrub transformations, factored per-column so TextAnalysisSpec can
    * drive them over planted PII (the synthetic corpus contains none — the
    * oracle proves cross-engine parity, the spec proves the redaction
    * signal). Patterns stay in the Java∩RE2 common dialect so Spark and
    * DuckDB compile them identically. Order matters (emails before bare
    * digit runs) and is fixed on both sides.
    */
  private[queries] val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[queries] val UrlPat = "https?://[^\\s]+"
  private[queries] val IdNumPat = "\\d{9,}"

  private[queries] def scrubbed(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "<EMAIL>"),
        UrlPat, "<URL>"),
      IdNumPat, "<ID>")

  /** ta_scrub — PII/URL redaction pass (emails, URLs, long digit runs):
    * per-doc redaction counts plus an md5 of the scrubbed text (compact
    * value-level evidence for the oracle without shipping the full text
    * through the compare). Pure per-row column work — no shuffle, stays in
    * WholeStageCodegen, scales with the scan.
    */
  def scrub(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(UrlPat), lit(0))).as("n_urls"),
      size(regexp_extract_all(col("text"), lit(IdNumPat), lit(0))).as("n_idnums"),
      md5(scrubbed(col("text"))).as("scrubbed_md5"))

  val scrubSql: String =
    raw"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INT) AS n_urls,
         |  CAST(len(regexp_extract_all(text, '\d{9,}')) AS INT) AS n_idnums,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    'https?://[^\s]+', '<URL>', 'g'),
         |    '\d{9,}', '<ID>', 'g')) AS scrubbed_md5
         |FROM documents""".stripMargin

  /** ta_ngram_stats — top-5 word bigrams per language by corpus frequency
    * (the vocabulary/corpus-statistics pass of a tokenizer-training or
    * contamination-audit pipeline). Two-phase: a full hash aggregation to
    * (lang, bigram, n) — partial agg map-side, so the shuffle carries
    * distinct bigrams, not token instances — then a rank window over the
    * AGGREGATED table. The window's partition-by-lang skew is bounded by
    * vocabulary size (distinct bigrams per language), not corpus size:
    * aggregation has already collapsed the linear factor, which is what
    * makes a per-group-rank window acceptable here and not in the ANN
    * paths (where the round-1 bug ranked raw candidate fan-out).
    */
  def ngramStats(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(graft.functions.WordShingles.wordShingles(col("text"), 2)).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
  }

  val ngramStatsSql: String =
    raw"""WITH tok AS (
         |  SELECT lang, regexp_split_to_array(text, '\s+') AS w FROM documents
         |  WHERE len(regexp_split_to_array(text, '\s+')) >= 2),
         |bg AS (
         |  SELECT lang,
         |    unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)]) AS bigram
         |  FROM tok),
         |counts AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
         |SELECT lang, bigram, n, rank FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY lang ORDER BY n DESC, bigram) AS INT) AS rank
         |  FROM counts) t
         |WHERE rank <= 5""".stripMargin

  /** ta_readability — Flesch reading-ease with the standard cheap proxies:
    * sentences ≈ terminal-punctuation runs ([.!?]+, floor 1), syllables ≈
    * vowel-group runs ([aeiouy]+) — the doc-level approximation a corpus
    * quality filter uses (per-word syllable counting buys nothing at
    * filter granularity). Pure per-row codegen column arithmetic, no
    * shuffle; the ratios divide exact integers so the score is
    * bit-identical across engines before the final round.
    */
  def readability(spark: SparkSession, sfDir: String): DataFrame = {
    val words = size(split(col("text"), "\\s+")).cast("double")
    val sentences = greatest(lit(1L),
      regexp_count(col("text"), lit("[.!?]+")).cast("long")).cast("double")
    val syllables = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("double")
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      words.cast("long").as("n_words"),
      sentences.cast("long").as("n_sentences"),
      syllables.cast("long").as("n_syllables"),
      round(lit(206.835) - lit(1.015) * (words / sentences)
        - lit(84.6) * (syllables / words), 4).as("flesch"))
  }

  /** ta_entropy — codepoint-distribution Shannon entropy per document (the
    * randomness filter that drops base64/minified noise and padding junk).
    * The entropy itself runs in-row via the CharEntropy codegen expression
    * — no explode, no per-character shuffle (the WinnowFingerprints
    * argument, one operator earlier in the pipeline). n_distinct_chars
    * rides the built-in array functions: a per-row array over the doc's
    * own chars, never materialized across rows.
    */
  def entropy(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(array_distinct(split(col("text"), ""))).cast("int")
        .as("n_distinct_chars"),
      round(graft.functions.CharEntropy.charEntropy(col("text")), 4)
        .as("entropy"))

  // LEFT JOIN + COALESCE so an empty-text document doesn't vanish from
  // the oracle (its chars unnest to zero freq rows): the Spark side keeps
  // such a row with entropy 0.0 and one distinct "char" (Java
  // "".split("") is [""]), which the defaults below restate. NULL text
  // stays a documented corpus invariant (the generator emits non-null).
  val entropySql: String =
    """WITH freq AS (
      |  SELECT doc_id, ch, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents) t
      |  GROUP BY 1, 2),
      |tot AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM freq GROUP BY 1),
      |ent AS (
      |  SELECT f.doc_id, CAST(count(*) AS INT) AS n_distinct_chars,
      |    round(-sum((f.c / t.n) * log2(f.c / t.n)), 4) AS entropy
      |  FROM freq f JOIN tot t ON f.doc_id = t.doc_id
      |  GROUP BY f.doc_id)
      |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
      |  COALESCE(e.n_distinct_chars, 1) AS n_distinct_chars,
      |  COALESCE(e.entropy, 0.0) AS entropy
      |FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id""".stripMargin

  /** ta_zipf — per-language Zipf's-law fit: rank the vocabulary by
    * frequency, regress log10(freq) on log10(rank) over the top
    * `ZipfTopK` terms (OLS), report slope / intercept / r². A clean
    * natural-language corpus sits near slope −1 (Zipf 1949); boilerplate
    * flattens the head, spam/templating steepens it — the single-number
    * corpus-mix diagnostic a pretraining ingest tracks per shard.
    *
    * Scale shape: the token explode feeds ONE partial+final hash agg on
    * (lang, token) — shuffle volume is O(distinct vocabulary), not corpus
    * tokens; the rank window runs over the PRE-AGGREGATED vocab (the
    * ta_charngrams pattern — per-language partitions bounded by vocab
    * size), and the regression is an algebraic 1-row-per-lang aggregate,
    * so nothing downstream of the first agg scales with corpus bytes.
    * Ties rank deterministically ((n DESC, tok) — binary string order in
    * both engines); log10(rank) of rank 1 anchors the fit at 0.
    */
  private val ZipfTopK = 500

  def zipf(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("tok"))
    val vocab = toks.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("tok"))
    val ranked = vocab.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= ZipfTopK)
      .select(col("lang"),
        log10(col("rnk").cast("double")).as("lr"),
        log10(col("n").cast("double")).as("lf"))
    ranked.groupBy(col("lang")).agg(
      count(lit(1)).cast("long").as("n_terms"),
      round(regr_slope(col("lf"), col("lr")), 4).as("slope"),
      round(regr_intercept(col("lf"), col("lr")), 4).as("intercept"),
      round(regr_r2(col("lf"), col("lr")), 4).as("r2"))
  }

  val zipfSql: String =
    raw"""WITH toks AS (
         |  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS tok
         |  FROM documents),
         |vocab AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
         |ranked AS (
         |  SELECT lang, log10(CAST(rnk AS DOUBLE)) AS lr,
         |    log10(CAST(n AS DOUBLE)) AS lf
         |  FROM (
         |    SELECT lang, n,
         |      row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rnk
         |    FROM vocab) t
         |  WHERE rnk <= $ZipfTopK)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
         |  round(regr_slope(lf, lr), 4) AS slope,
         |  round(regr_intercept(lf, lr), 4) AS intercept,
         |  round(regr_r2(lf, lr), 4) AS r2
         |FROM ranked GROUP BY lang""".stripMargin

  /** ta_gopher — the published Gopher quality rules (Rae et al. 2021,
    * §A1.1) as one projection. Word-level: word count in [50, 100k],
    * mean word length in [3, 10], '#'- and ellipsis-to-word ratios
    * < 0.1 (ellipses counted as ASCII '...' runs plus U+2026 '…'
    * characters, in BOTH engines), ≥80% of words containing an
    * alphabetic character, and ≥2 of the paper's 8 stopwords present.
    * Line-level (live since round 7 — previously documented out on the
    * single-line driver corpus): reject when >90% of lines start with a
    * bullet ('•' or '-', no leading-whitespace trim) or >30% end with
    * an ellipsis ('...' or '…'). Lines are `\n`-splits with trailing
    * empties KEPT (Spark `split` limit −1 ≡ DuckDB
    * `regexp_split_to_array`); a blank line starts with no bullet and
    * ends with no ellipsis, so it dilutes both ratios identically in
    * both engines. Emits the per-doc stats plus the pass flag (as 0/1
    * int — both engines hash it identically), so the same query serves
    * as the filter AND its audit trail.
    *
    * Scale shape: pure per-row projection, no shuffle at all. Symbol
    * counts ride `replace` length deltas (codegen, no regex scan); the
    * alpha-word and line filters are the bounded higher-order functions
    * — per-row token/line counts, the same trade ta_quality already
    * makes. The pass boolean compares UNROUNDED ratios, which are safe
    * cross-engine: both operands derive from integer counts, so the
    * IEEE quotients are bit-identical in Spark and DuckDB — no ulp
    * boundary to flake on.
    *
    * On the synthetic test corpus the word-level gate rejects every
    * document (10–99-word docs straddle the 50-word floor; multilingual
    * word salad carries ≤1 of the paper's 8 ENGLISH stopwords) — the
    * expected verdict of the published English-centric ruleset on this
    * input, asserted in TextAnalysisSpec rather than assumed. The line
    * rules are exercised by TextAnalysisSpec's multi-line fixture
    * corpus, with a doc rejected BY each line rule alone.
    */
  def gopher(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    val toks = split(t, "\\s+")
    val nW = size(toks).cast("double")
    val nChars = length(regexp_replace(t, "\\s+", "")).cast("double")
    val nHash = (length(t) - length(expr("replace(text, '#', '')"))).cast("double")
    val nEll = ((length(t) - length(expr("replace(text, '...', '')"))) / 3 +
      (length(t) - length(expr("replace(text, '…', '')")))).cast("double")
    val nAlpha = size(filter(toks, x => x.rlike("[a-zA-Z]"))).cast("double")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("double")
    val nBullet = size(filter(lines,
      l => l.startsWith("•") || l.startsWith("-"))).cast("double")
    val nEllLine = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))).cast("double")
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce(_ + _)
    val pass = nW.between(50, 100000) &&
      (nChars / nW).between(3, 10) &&
      nHash / nW < 0.1 && nEll / nW < 0.1 &&
      nAlpha / nW >= 0.8 &&
      nBullet / nLines <= 0.9 && nEllLine / nLines <= 0.3 &&
      stopHits >= 2
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_words"),
      round(nChars / nW, 4).as("mean_word_len"),
      round(nHash / nW, 4).as("hash_ratio"),
      round(nEll / nW, 4).as("ellipsis_ratio"),
      round(nAlpha / nW, 4).as("alpha_ratio"),
      round(nBullet / nLines, 4).as("bullet_line_ratio"),
      round(nEllLine / nLines, 4).as("ellipsis_line_ratio"),
      stopHits.cast("int").as("stop_hits"),
      when(pass, 1).otherwise(0).cast("int").as("pass"))
  }

  val gopherSql: String = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => s"(CASE WHEN list_contains(regexp_split_to_array(text, '\\s+'), '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    raw"""WITH m AS (
         |  SELECT doc_id,
         |    len(regexp_split_to_array(text, '\s+')) AS n_words,
         |    length(regexp_replace(text, '\s+', '', 'g')) AS n_chars,
         |    length(text) - length(replace(text, '#', '')) AS n_hash,
         |    (length(text) - length(replace(text, '...', ''))) / 3
         |      + (length(text) - length(replace(text, '…', ''))) AS n_ell,
         |    len(list_filter(regexp_split_to_array(text, '\s+'),
         |        x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         |    len(regexp_split_to_array(text, '\n')) AS n_lines,
         |    len(list_filter(regexp_split_to_array(text, '\n'),
         |        x -> starts_with(x, '•') OR starts_with(x, '-'))) AS n_bullet,
         |    len(list_filter(regexp_split_to_array(text, '\n'),
         |        x -> ends_with(x, '...') OR ends_with(x, '…'))) AS n_ell_line,
         |    $stops AS stop_hits
         |  FROM documents)
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |  round(n_chars * 1.0 / n_words, 4) AS mean_word_len,
         |  round(n_hash * 1.0 / n_words, 4) AS hash_ratio,
         |  round(n_ell * 1.0 / n_words, 4) AS ellipsis_ratio,
         |  round(n_alpha * 1.0 / n_words, 4) AS alpha_ratio,
         |  round(n_bullet * 1.0 / n_lines, 4) AS bullet_line_ratio,
         |  round(n_ell_line * 1.0 / n_lines, 4) AS ellipsis_line_ratio,
         |  CAST(stop_hits AS INT) AS stop_hits,
         |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
         |    AND n_chars * 1.0 / n_words BETWEEN 3 AND 10
         |    AND n_hash * 1.0 / n_words < 0.1
         |    AND n_ell * 1.0 / n_words < 0.1
         |    AND n_alpha * 1.0 / n_words >= 0.8
         |    AND n_bullet * 1.0 / n_lines <= 0.9
         |    AND n_ell_line * 1.0 / n_lines <= 0.3
         |    AND stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS pass
         |FROM m""".stripMargin
  }

  val readabilitySql: String =
    raw"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_words,
         |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
         |    AS n_sentences,
         |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         |    AS n_syllables,
         |  round(206.835
         |    - 1.015 * (len(regexp_split_to_array(text, '\s+'))
         |        * 1.0 / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
         |    - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))
         |        * 1.0 / len(regexp_split_to_array(text, '\s+'))), 4) AS flesch
         |FROM documents""".stripMargin
}
