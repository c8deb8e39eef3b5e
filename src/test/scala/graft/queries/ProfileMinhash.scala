package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: stage-wise timing of the dd_minhash pipeline at sf0.1. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("profile", "local[32]", 32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    time("docs.count")(docs.count())
    val sh = docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("shingle"))
      .distinct()
    time("shingles.distinct")(sh.count())
    time("shingles again")(sh.count())
    val full = graft.queries.Dedup.minhash(spark, sf)
    time("full dd_minhash (warm)")(full.count())
    time("full dd_minhash again")(graft.queries.Dedup.minhash(spark, sf).count())
    time("exact jaccard")(graft.queries.Dedup.ngramJaccard(spark, sf).count())
    spark.stop()
  }
}
