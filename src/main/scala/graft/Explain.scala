package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("explain", "local[4]", 4)
    val sf = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q2_join", "q3_topk", "dd_embed_bucketed", "ann_ivf",
        "ann_lsh", "dd_minhash", "q14_asof", "q15_range_join", "ev_attribution",
        "ta_tfidf", "dd_decontaminate")
    for (name <- names) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
