package graft

/** Scratch instrument: measured in-memory size of the PQ scan-side
  * relation vs the raw-vector relation (the ann_ivf_pq memory claim).
  * Code size is shape-determined, so a zero codebook suffices.
  */
object SizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("size-probe")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    // Diff storage info across the cache call (ADVICE r11): summing
    // memSize over ALL persistent RDDs would fold any other cached block
    // alive in the session (e.g. a lingering localCheckpoint) into both
    // measurements and skew the fat/thin ratio.
    def cachedBytes(df: org.apache.spark.sql.DataFrame): Long = {
      val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
      val c = df.cache()
      c.count()
      val b = spark.sparkContext.getRDDStorageInfo
        .filterNot(i => before.contains(i.id)).map(_.memSize).sum
      c.unpersist(true)
      b
    }
    val raw = Tables.embeddings(spark, sf)
    val n = raw.count()
    val fat = cachedBytes(raw.select(col("vec_id"), col("embedding")))
    val books = new Array[Double](8 * 256 * 8)
    val thin = cachedBytes(raw.select(col("vec_id"),
      graft.functions.PqCodes.pqEncode(col("embedding"), books, 8, 256, 8).as("code")))
    println(f"[size] n=$n fatBytes=$fat thinBytes=$thin ratio=${fat.toDouble / thin}%.1f")
    spark.stop()
  }
}
