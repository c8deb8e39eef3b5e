package graft

/** Scratch: stage-level cost breakdown of dd_embed_hi at a staged scale
  * point — times the signature pass, probe fan-out, candidate join, and
  * verify separately so the work model can be corrected against
  * measured volumes rather than argued.
  */
object EmbedHiProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("embedhi-probe")
    val sf = if (args.nonEmpty) args(0) else "/tmp/graft_scale/sf10"
    val dim = if (args.length > 1) args(1).toInt else 64
    val (cands, probes, keyed) =
      if (dim == 768) graft.queries.Dedup.embedHi768Debug(spark, sf)
      else graft.queries.Dedup.embedHiDebug(spark, sf)
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[hiprobe] $tag rows=$n wall=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    timed("keyed")(keyed.count())
    timed("raw-join")(probes.count())
    timed("candidates")(cands.count())
    spark.stop()
  }
}
