package graft.queries

import org.apache.spark.sql.functions._

/** g-partition skew census for dd_substring_cut's single-pass window form
  * (round 16, VERDICT r15 #3): the WindowExec over g ships the entire
  * position stream through one hash exchange with no map-side combine,
  * and an ultra-hot boilerplate window hash (a license header shared by
  * millions of docs) lands in ONE task's spillable buffer. This probe
  * measures the quantity that decides the form — rows per g at staged
  * scale points: if the max ever approaches ~10⁷ positions, the dup test
  * flips to the combinable `groupBy(g).agg(min,max)` + size-guarded
  * semi-join (dd_lines' pattern); below that the window form's single
  * exchange wins. Committed as the SUBSTR_r16 skew annex so the decision
  * is a measurement, not an argument.
  *
  *   sbt "Test/runMain graft.queries.SubstrSkewProbe OUT.json <sfDir> ..."
  */
object SubstrSkewProbe {

  /** Locale-pinned JSON number (the ADVICE r18 defect class): f"%.Nf"
    * honors the default locale — comma decimals break the artifact.
    */
  private def fmtN(v: Double, d: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))

  private val SubstrWindow = 40

  /** `planted:N` arg: synthesize an N-doc corpus where EVERY doc opens
    * with the same 200-char boilerplate header (a license header shared
    * corpus-wide — the exact hot-g scenario the staged mosaics cannot
    * produce, since replicas share only 4-word chunks < the 40-char
    * window). Each of the header's ~161 window hashes then carries N
    * position rows, and the census + a timed substringCut lap measure
    * whether the g-window's one-group-at-a-time spillable buffer
    * actually absorbs a hot g of that size — the decision input for
    * window-form vs combinable-form (VERDICT r15 #3).
    */
  private def plantHotG(spark: org.apache.spark.sql.SparkSession,
      n: Long): String = {
    import org.apache.spark.sql.functions._
    val dir = s"/tmp/graft_substr_planted_$n"
    val out = new java.io.File(s"$dir/documents.parquet")
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      val header = "Licensed under the Apache License, Version 2.0; " +
        "you may not use this file except in compliance with the " +
        "License. You may obtain a copy of the License at the usual " +
        "location. Unless required by applicable law."
      spark.range(n)
        .select(col("id").as("doc_id"),
          concat(lit(header), lit(" body "),
            // Unique tail so docs are not wholesale identical: 40+ chars
            // derived from the id, no cross-doc windows of its own.
            sha2(col("id").cast("string"), 256)).as("text"),
          lit("en").as("lang"), lit("planted").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(out.getAbsolutePath)
    }
    dir
  }

  /** `stream:N` arg (round 17, VERDICT r16 #5): time the WindowExec dup
    * test ALONE over a synthetic position stream with N rows in ONE hot
    * g — the shape 100 TB license-header density implies (~5M docs
    * sharing a window hash), which a full planted document corpus at
    * this host's size won't reach (the r16 gate topped out at 500k).
    * The stream is (g, doc_id, i) exactly as substringCut's window
    * stage consumes it: one g carrying N rows from N distinct docs,
    * plus an equal volume of unique-g background so the hash exchange
    * and the spill path see realistic mixed occupancy rather than a
    * single-partition toy. The timed plan is the probe-local copy of
    * the stage: min/max over Window.partitionBy(g), filter lo ≠ hi,
    * count — no doc scan, no islands tail, so the wall isolates the
    * one-task ExternalAppendOnlyUnsafeRowArray buffer the fallback
    * decision cares about.
    */
  private def streamHotG(spark: org.apache.spark.sql.SparkSession,
      n: Long): (String, () => Double) = {
    val hot = spark.range(n)
      .select(lit(0xC0FFEEL).as("g"), col("id").as("doc_id"),
        lit(1L).as("i"))
    val cold = spark.range(n)
      .select((col("id") + 1000000000L).as("g"),
        (col("id") % 1000L).as("doc_id"), (col("id") / 1000L + 2L).as("i"))
    val streamDf = hot.unionByName(cold)
    val byG = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    def lap(): Double = {
      val t0 = System.nanoTime()
      streamDf
        .withColumn("lo", min(col("doc_id")).over(byG))
        .withColumn("hi", max(col("doc_id")).over(byG))
        .filter(col("lo") =!= col("hi"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (s"stream_hot_g_$n", lap)
  }

  def main(args: Array[String]): Unit = {
    val (outPath, dirsRaw) =
      if (args.nonEmpty && args.head.endsWith(".json"))
        (Some(args.head), args.toSeq.drop(1))
      else (None, if (args.nonEmpty) args.toSeq
            else Seq("/tmp/graft_scale/sf3", "/tmp/graft_scale/sf10",
              "/tmp/graft_scale/sf30"))
    val spark = graft.GraftSession("substr-skew-probe")
    // stream:N args are handled separately from the corpus census.
    val streamNs = dirsRaw.filter(_.startsWith("stream:"))
      .map(_.stripPrefix("stream:").toLong)
    val dirs = dirsRaw.filterNot(_.startsWith("stream:")).map { d =>
      if (d.startsWith("planted:")) plantHotG(spark, d.stripPrefix("planted:").toLong)
      else d
    }
    val streamPoints = streamNs.map { n =>
      val (tag, lap) = streamHotG(spark, n)
      lap() // warm-up
      val sec = (1 to 2).map(_ => lap()).min
      println(f"[substrskew] $tag windowSec=$sec%.1f")
      s"""{"sf":"$tag","hotGRows":$n,"windowSec":${fmtN(sec, 3)}}"""
    }
    val points = for (sf <- dirs) yield {
      val docs = graft.Tables.documents(spark, sf)
        .filter(length(col("text")) >= SubstrWindow)
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      // The exact window-position stream substringCut hashes (same
      // 10-line corpus idiom; deliberately not extracted — see the
      // substringCut scaladoc note on code identity).
      val gramsPos = docs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")) - (SubstrWindow - 1)))
            .as("i"))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          xxhash64(expr(s"substring(text, i, $SubstrWindow)")).as("g"))
      // NO checkpoint of perG — at 300× it is ~400M rows (≈15 GB of
      // blocks, the exact residency sin the substring_cut rewrite
      // deleted). Everything lands in TWO jobs over the lineage: one
      // combined aggregate row + one top-5 scan.
      val perG = gramsPos.groupBy(col("g")).agg(
        count(lit(1)).as("n"),
        (min(col("doc_id")) =!= max(col("doc_id"))).as("xdoc"))
      val s = perG.agg(
        count(lit(1)).as("distinctG"),
        sum(col("n")).as("posRows"),
        count_if(col("xdoc")).as("dupG"),
        coalesce(sum(when(col("xdoc"), col("n"))), lit(0L)).as("dupPosRows"),
        percentile_approx(col("n"),
          array(lit(0.5), lit(0.99), lit(0.999)), lit(10000)).as("p")).head()
      val distinctG = s.getLong(0)
      val posRows = s.getLong(1)
      val dupG = s.getLong(2)
      val dupPosRows = s.getLong(3)
      val pct = s.getSeq[Long](4)
      val top = perG.orderBy(col("n").desc).limit(5)
        .select(col("n")).collect().map(_.getLong(0))
      // Planted dirs get a timed substringCut lap (min of 2 warm) — the
      // staged dirs' cut walls already land in SUBSTR_r{N} via
      // SubstrProbe; here the wall answers "does the hot-g group buffer
      // absorb max(n) positions in one task".
      val cutSec =
        if (!sf.contains("graft_substr_planted")) -1.0
        else {
          Dedup.substringCut(spark, sf).count() // warm-up
          (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            Dedup.substringCut(spark, sf).count()
            (System.nanoTime() - t0) / 1e9
          }.min
        }
      println(f"[substrskew] $sf%-24s docs=$nDocs%8d pos=$posRows%11d " +
        f"distinctG=$distinctG%11d dupG=$dupG%9d dupPos=$dupPosRows%10d " +
        f"p50=${pct(0)} p99=${pct(1)} p999=${pct(2)} top=${top.mkString("/")} " +
        f"cutSec=$cutSec%.1f")
      s"""{"sf":"$sf","docs":$nDocs,"posRows":$posRows,""" +
        s""""distinctG":$distinctG,"dupG":$dupG,"dupPosRows":$dupPosRows,""" +
        s""""p50":${pct(0)},"p99":${pct(1)},"p999":${pct(2)},""" +
        s""""top5":[${top.mkString(",")}],"cutSec":$cutSec}"""
    }
    val out = s"""{"points":[${(points ++ streamPoints).mkString(",")}]}"""
    println("[substrskew] " + out)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), (out + "\n").getBytes("UTF-8")))
    spark.stop()
  }
}
