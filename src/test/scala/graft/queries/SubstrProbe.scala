package graft.queries

/** Output-cardinality comparison of the two substring-dedup forms across
  * staged scale points — the measurement behind splitting
  * dd_substring_cut out of dd_substring (round 14). The pair form's row
  * count is the lower bound on ANY pair-list implementation's work; if
  * it compounds superlinearly on mosaic growth while the per-doc cut
  * rows stay ~linear, the 30→100× marginal of 1.45 (SCALE_r14) is
  * intrinsic to the pair SEMANTICS, not a plan defect the engine should
  * chase. Promoted from scratch instrument to committed round artifact
  * (SUBSTR_r{N}.json via round_probes.sh — VERDICT r14 #4: the
  * span-compounding analysis must be a curve in the repo, not prose in a
  * memo).
  *
  *   sbt "Test/runMain graft.queries.SubstrProbe OUT.json <sfDir> [cutonly:<sfDir> ...]"
  *
  * A `cutonly:` prefix skips the pair form at that point — at 300× the
  * pair form's wall is ~quarter-hour by its own measured curve, and the
  * cut form is the only one with a production claim past 100×.
  */
object SubstrProbe {

  /** Locale-pinned JSON number (the ADVICE r18 defect class): f"%.Nf"
    * honors the default locale — comma decimals break the artifact.
    */
  private def fmtN(v: Double, d: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val (outPath, dirs) =
      if (args.nonEmpty && args.head.endsWith(".json"))
        (Some(args.head), args.toSeq.drop(1))
      else (None, if (args.nonEmpty) args.toSeq
            else Seq("/root/testdata/sf0.1", "/tmp/graft_scale/sf0.3",
              "/tmp/graft_scale/sf1"))
    val spark = graft.GraftSession("substr-probe")
    val points = for (d <- dirs) yield {
      val cutOnly = d.startsWith("cutonly:")
      val sf = d.stripPrefix("cutonly:")
      val docs = graft.Tables.documents(spark, sf).count()
      val t0 = System.nanoTime()
      val cutSpans = Dedup.substringCut(spark, sf).count()
      val cutSec = (System.nanoTime() - t0) / 1e9
      val (pairSpans, pairSec) =
        if (cutOnly) (-1L, -1.0)
        else {
          val t1 = System.nanoTime()
          val p = Dedup.substringDup(spark, sf).count()
          (p, (System.nanoTime() - t1) / 1e9)
        }
      println(f"[substrprobe] $sf%-28s docs=$docs%9d pairSpans=$pairSpans%9d " +
        f"(${pairSec}%.1fs) cutSpans=$cutSpans%9d (${cutSec}%.1fs)")
      s"""{"sf":"$sf","docs":$docs,"pairSpans":$pairSpans,""" +
        s""""pairSec":${fmtN(pairSec, 2)},"cutSpans":$cutSpans,"cutSec":${fmtN(cutSec, 2)}}"""
    }
    val out = s"""{"points":[${points.mkString(",")}]}"""
    println("[substrprobe] " + out)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), (out + "\n").getBytes("UTF-8")))
    spark.stop()
  }
}
