package graft.queries

/** Scratch instrument: does the hi768 100× candidate join leave cores
  * idle at the session's 32 shuffle partitions? Times the query at
  * several runtime shuffle-partition settings in one JVM (conf is
  * per-query at plan time).
  *
  * Measured (r13, 100× staging, one lap each on a slow-host window —
  * laps ~2.7× the committed quiet-host min): 32 → 104.4/101.7 s,
  * 64 → 91.4 s, 128 → 135.0 s. The ~10% read at 64 is inside the
  * ±25% host noise band and 128 is clearly WORSE (scheduling overhead
  * dominates the slim-row shuffle), so the session default stands —
  * the candidate join is CPU-bound on probe generation + hash probing,
  * not starved for partitions; at cluster scale partitions track cores.
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("part-probe")
    val sf = if (args.nonEmpty) args(0) else "/tmp/graft_scale/sf10"
    for (parts <- Seq(32, 64, 128, 32)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("dd_embed_hi768")(spark, sf).count()
      println(f"[partprobe] parts=$parts rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
