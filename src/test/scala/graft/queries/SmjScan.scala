package graft.queries

/** Scratch instrument: static join-strategy census over the heavy query
  * surface (SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin counts
  * per executed plan). This is how the round-13 attach-guard sweep was
  * scoped and verified — run it after touching any join-shaped operator.
  *
  *   sbt "Test/runMain graft.queries.SmjScan"
  */
object SmjScan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("smj-scan")
    val sf = "/root/testdata/sf0.1"
    val qs = Seq("dd_minhash","dd_simhash","dd_clusters","dd_substring","dd_substring_cut",
      "dd_keep_best","dd_winnow",
      "dd_decontaminate","dd_decontaminate_fuzzy","dd_lines","dd_delta","dd_delta_chain",
      "dd_delta_embed_chain","mm_phash","pipeline_clean_corpus","dd_editdist",
      "dd_ngram_jaccard","ta_tfidf","ev_sessionize","ev_attribution","dd_embed_auto")
    for (q <- qs) {
      try {
        val p = graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
        val shj = p.linesIterator.count(_.contains("ShuffledHashJoin"))
        val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
        println(f"[smjscan] $q%-24s SMJ=$smj SHJ=$shj BHJ=$bhj")
      } catch { case e: Exception => println(s"[smjscan] $q ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
