package graft
object WinnowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession("winnow-bench", "local[32]", 32)
    def force(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("dd_winnow")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    force()
    (1 to 3).foreach(i => println(f"[t] dd_winnow lap$i: ${force()}%.2f s"))
    val t0 = System.nanoTime()
    SparkEntry.queries("ta_winnow")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[t] ta_winnow: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
