package graft.queries

import org.apache.spark.sql.functions._

/** g-partition skew census for dd_substring_cut's single-pass window form
  * (round 16, VERDICT r15 #3): the WindowExec over g ships the entire
  * position stream through one hash exchange with no map-side combine,
  * and an ultra-hot boilerplate window hash (a license header shared by
  * millions of docs) lands in ONE task's spillable buffer. This probe
  * measures the quantity that decides the form — rows per g at staged
  * scale points: if the max ever approaches ~10⁷ positions, the dup test
  * flips to the combinable `groupBy(g).agg(min,max)` + size-guarded
  * semi-join (dd_lines' pattern); below that the window form's single
  * exchange wins. Committed as the SUBSTR_r16 skew annex so the decision
  * is a measurement, not an argument.
  *
  *   sbt "Test/runMain graft.queries.SubstrSkewProbe OUT.json <sfDir> ..."
  */
object SubstrSkewProbe {
  private val SubstrWindow = 40

  def main(args: Array[String]): Unit = {
    val (outPath, dirs) =
      if (args.nonEmpty && args.head.endsWith(".json"))
        (Some(args.head), args.toSeq.drop(1))
      else (None, if (args.nonEmpty) args.toSeq
            else Seq("/tmp/graft_scale/sf3", "/tmp/graft_scale/sf10",
              "/tmp/graft_scale/sf30"))
    val spark = graft.GraftSession("substr-skew-probe")
    val points = for (sf <- dirs) yield {
      val docs = graft.Tables.documents(spark, sf)
        .filter(length(col("text")) >= SubstrWindow)
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      // The exact window-position stream substringCut hashes (same
      // 10-line corpus idiom; deliberately not extracted — see the
      // substringCut scaladoc note on code identity).
      val gramsPos = docs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")) - (SubstrWindow - 1)))
            .as("i"))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          xxhash64(expr(s"substring(text, i, $SubstrWindow)")).as("g"))
      val perG = gramsPos.groupBy(col("g")).agg(
          count(lit(1)).as("n"),
          (min(col("doc_id")) =!= max(col("doc_id"))).as("xdoc"))
        .localCheckpoint()
      val posRows = perG.agg(sum(col("n"))).head().getLong(0)
      val distinctG = perG.count()
      val dup = perG.filter(col("xdoc"))
      val dupG = dup.count()
      val dupPosRows =
        if (dupG == 0) 0L else dup.agg(sum(col("n"))).head().getLong(0)
      val pct = perG.select(percentile_approx(col("n"),
        array(lit(0.5), lit(0.99), lit(0.999)), lit(10000)).as("p")).head()
        .getSeq[Long](0)
      val top = perG.orderBy(col("n").desc).limit(5)
        .select(col("n")).collect().map(_.getLong(0))
      println(f"[substrskew] $sf%-24s docs=$nDocs%8d pos=$posRows%11d " +
        f"distinctG=$distinctG%11d dupG=$dupG%9d dupPos=$dupPosRows%10d " +
        f"p50=${pct(0)} p99=${pct(1)} p999=${pct(2)} top=${top.mkString("/")}")
      s"""{"sf":"$sf","docs":$nDocs,"posRows":$posRows,""" +
        s""""distinctG":$distinctG,"dupG":$dupG,"dupPosRows":$dupPosRows,""" +
        s""""p50":${pct(0)},"p99":${pct(1)},"p999":${pct(2)},""" +
        s""""top5":[${top.mkString(",")}]}"""
    }
    val out = s"""{"points":[${points.mkString(",")}]}"""
    println("[substrskew] " + out)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), (out + "\n").getBytes("UTF-8")))
    spark.stop()
  }
}
