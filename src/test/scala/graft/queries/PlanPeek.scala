package graft.queries

/** Scratch instrument: run a SparkEntry query end-to-end and print the
  * FINAL (post-AQE) executed plan's join/exchange/sort lines. The static
  * plan lies about join strategies under AQE — this is how the round-13
  * cascade finding was made (sort-merge attach joins surviving AQE
  * because the checkpointed sketch leaf reports no stats).
  *
  *   sbt "Test/runMain graft.queries.PlanPeek <sfDir> [query]"
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("plan-peek")
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val q = if (args.length > 1) args(1) else "dd_embed_hi768"
    val df = graft.SparkEntry.queries(q)(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println("=== FINAL PLAN JOIN/EXCHANGE/SORT LINES ===")
    p.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.matches(".*\\bSort\\b.*"))
      .foreach(l => println(l.take(170)))
    println("=== END ===")
    spark.stop()
  }
}
