package graft.queries

/** Scratch instrument: output-cardinality comparison of the two
  * substring-dedup forms across staged scale points — the measurement
  * behind splitting dd_substring_cut out of dd_substring (round 14).
  * The pair form's row count is the lower bound on ANY pair-list
  * implementation's work; if it compounds superlinearly on mosaic
  * growth while the per-doc cut rows stay ~linear, the 30→100× marginal
  * of 1.45 (SCALE_r14) is intrinsic to the pair SEMANTICS, not a plan
  * defect the engine should chase.
  *
  *   sbt "Test/runMain graft.queries.SubstrProbe <sfDir> [<sfDir> ...]"
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("substr-probe")
    val sfs = if (args.nonEmpty) args.toSeq
              else Seq("/root/testdata/sf0.1", "/tmp/graft_scale/sf0.3",
                "/tmp/graft_scale/sf1")
    for (sf <- sfs) {
      val docs = graft.Tables.documents(spark, sf).count()
      val pairSpans = Dedup.substringDup(spark, sf).count()
      val cutSpans = Dedup.substringCut(spark, sf).count()
      println(f"[substrprobe] $sf%-28s docs=$docs%9d pairSpans=$pairSpans%9d cutSpans=$cutSpans%9d")
    }
    spark.stop()
  }
}
