package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape inspector. Prints `explain("formatted")` for the named
  * queries (all queries when none named); with GRAFT_EXPLAIN_OUT set,
  * additionally writes one `<query><suffix>.txt` per query into that
  * directory (suffix from GRAFT_EXPLAIN_SUFFIX, e.g. "_before"/"_after")
  * — the optimization-round evidence files under plans/r{N}/.
  * GRAFT_EXPLAIN_SF overrides the corpus (plan SHAPE is scale-invariant
  * for everything but the guarded dispatches, which read counts; sf0.01
  * keeps the capture fast while matching the driver's oracle scale).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession("explain", s"local[$cpus]", cpus.toInt)
    val sf = sys.env.getOrElse("GRAFT_EXPLAIN_SF", "/root/testdata/sf0.01")
    val outDir = sys.env.get("GRAFT_EXPLAIN_OUT")
    val suffix = sys.env.getOrElse("GRAFT_EXPLAIN_SUFFIX", "")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q2_join", "q3_topk", "dd_embed_bucketed", "ann_ivf",
        "ann_lsh", "dd_minhash", "q14_asof", "q15_range_join", "ev_attribution",
        "ta_tfidf", "dd_decontaminate")
    for (name <- names) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sf)
      df.explain("formatted")
      outDir.foreach { dir =>
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$name$suffix.txt"),
          txt.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
