package graft.queries

/** Probe-budget diag for ann_filtered_range's stratum-vs-corpus-wide
  * comparison (round 16, VERDICT r15 #6): prints k, calibrated nprobe,
  * and touched-rows-per-query for both models on the same stratum, so
  * RECALL_r{N}'s two range rows are read against a measured budget —
  * "recall ≥ corpus-wide at equal probe budget" needs both halves.
  * Measured at introduction: sf0.1 {k 44/28, nprobe 28/20, touched
  * 644/720}; at sf1 the stratum model reads 1.000 vs 0.960 recall.
  *
  *   sbt "Test/runMain graft.queries.RangeDiagProbe /root/testdata/sf0.1"
  */
object RangeDiagProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("range-diag")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    dirs.foreach { sf =>
      println(s"[rangediag] $sf " + Similarity.rangeBudgetDiag(spark, sf))
    }
    spark.stop()
  }
}
