package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("explain", "local[4]", 4)
    val sf = "/root/testdata/sf0.01"
    for (name <- Seq("q1_agg", "q2_join", "q3_topk", "dd_embed_cosine", "ann_ivf")) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
