package graft.queries

import org.apache.spark.sql.functions._

/** Cross-ENGINE check for ta_gopher's line-level rules on multi-line text
  * (ADVICE r7 #2 / verdict r7 next-round #6).
  *
  * The driver corpus is single-line, so under the driver's DuckDB oracle
  * the two line-rule columns (bullet_line_ratio, ellipsis_line_ratio) are
  * vacuously constant — a Spark-vs-DuckDB divergence in the line-rule
  * arithmetic (split semantics on trailing empties, starts/ends-with on
  * multi-byte glyphs, the ≤-boundary quotients) would go undetected.
  * TextAnalysisSpec's multi-line fixture runs only the Spark engine.
  *
  * This main stages a corpus where the line rules BITE — every glyph
  * variant, both rule boundaries hit EXACTLY (9/10 bullets = 0.9,
  * 3/10 ellipsis ends = 0.3, the ≤ edge), kept trailing empties, blank
  * interior lines — runs TextAnalysis.gopher on it, and dumps the result
  * plus gopherSql; scripts/gopher_xcheck.py then runs the SAME SQL in
  * DuckDB over the SAME parquet and asserts row-level equality, writing
  * GOPHER_XCHECK_r{N}.json. Both engines must agree bit-for-bit: every
  * ratio is a quotient of two integer-derived doubles, so there is no
  * ulp boundary to flake on — any difference is a semantics bug.
  *
  * Run: sbt "Test/runMain graft.queries.GopherLineCrossCheck /tmp/gopher_xcheck"
  */
object GopherLineCrossCheck {

  /** 10 words, 2 of the 8 Gopher stopwords, all-alpha — every word-level
    * gate passes on any doc built from it, so line rules decide alone.
    */
  private val line = "the quick brown fox and the lazy dog run with joy"

  private[queries] val corpus: Seq[(Long, String)] = Seq(
    // 1: clean multi-line — passes everything.
    1L -> Seq.fill(6)(line).mkString("\n"),
    // 2: 10/10 '-' bullet starts — fails the bullet rule alone.
    2L -> Seq.fill(10)("- " + line).mkString("\n"),
    // 3: 4/10 ellipsis ends, mixed ASCII '...' + U+2026 — fails the
    //    ellipsis-line rule alone (ratio 0.4 > 0.3).
    3L -> (Seq.fill(3)(line + "...") ++ Seq(line + "…") ++
      Seq.fill(6)(line)).mkString("\n"),
    // 4: 10/10 '•' bullet starts — the multi-byte bullet glyph.
    4L -> Seq.fill(10)("• " + line).mkString("\n"),
    // 5: EXACTLY 9/10 bullets = 0.9 — the ≤ boundary must PASS in both
    //    engines (both quotients derive from integers: no ulp risk).
    5L -> (Seq.fill(9)("- " + line) :+ line).mkString("\n"),
    // 6: EXACTLY 3/10 ellipsis ends = 0.3 — the other ≤ boundary.
    6L -> (Seq.fill(3)(line + "…") ++ Seq.fill(7)(line)).mkString("\n"),
    // 7: trailing newline — the kept trailing empty line dilutes both
    //    ratios (split limit −1 ≡ regexp_split_to_array).
    7L -> (Seq.fill(6)(line).mkString("\n") + "\n"),
    // 8: blank INTERIOR lines — empties start no bullet, end no ellipsis.
    8L -> Seq.fill(6)(line).mkString("\n\n"),
    // 9: word-level reject (under 50 words) on multi-line text — the
    //    line ratios still compute and compare.
    9L -> ("only a few words here\nand some more on line two"),
    // 10: hash-ratio reject on multi-line text.
    10L -> Seq.fill(6)(line + " ###tag###").mkString("\n"))

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/gopher_xcheck")
    val spark = graft.GraftSession("gopher-line-xcheck")
    import spark.implicits._
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    TextAnalysis.gopher(spark, outDir)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/spark_gopher.parquet")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/gopher_sql.txt"),
      TextAnalysis.gopherSql.getBytes("UTF-8"))
    println(s"[gopher-xcheck] staged ${corpus.size} docs + spark result + " +
      s"oracle sql under $outDir")
    spark.stop()
  }
}
