package graft.queries

import org.apache.spark.sql.DataFrame

/** Per-corpus index-product caching, shared by every index-build product
  * in the engine (ANN calibration pairs, centroid models, PQ codebooks,
  * the embed-LSH sampled collision selectivity). The key is the corpus's
  * PHYSICAL identity — sorted input file paths + length + modification
  * time, read from driver-side FileSystem metadata (no Spark job) — so a
  * corpus regenerated IN PLACE misses the cache instead of serving stale
  * parameters, and distinct corpora (the scale/recall probes stage
  * several per JVM) never collide. Callers whose model depends on MORE
  * than the raw file content (a derived corpus like the dd_embed_hi
  * plant construction, a dimension choice) must fold a tag into the key.
  *
  * Determinism: every cached build is content-deterministic per corpus
  * (sorted collects, seeded fits), so a cache hit returns byte-identical
  * parameters and downstream fingerprints are unchanged (cross-mode
  * gate, CLUSTER_r11).
  */
private[queries] object CorpusCaches {

  def corpusKey(df: DataFrame): String = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }.mkString("|")
  }

  /** MD5 of the corpus's physical identity — the compact form every
    * staged-product provenance manifest records as `corpusFp`. Empty
    * when the corpus has no file lineage: such a corpus can neither
    * stage nor be served (identity unprovable) — the p1Cache bypass
    * rule, shared by the embedding-signature and IVF-index fences.
    */
  def corpusFpMd5(df: DataFrame): String = {
    val key = corpusKey(df)
    if (key.isEmpty) ""
    else java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Cache-or-build under a physical-identity key. An EMPTY key means
    * the DataFrame is not file-backed (in-memory test corpora have no
    * input files) — two such corpora would collide on "", so the cache
    * is bypassed and the model built fresh.
    */
  def cachedOrBuild[T](cache: java.util.concurrent.ConcurrentHashMap[String, T],
      key: String)(build: => T): T =
    if (key.isEmpty) build
    else {
      if (cache.size > 64) cache.clear() // bound a long session's footprint
      cache.computeIfAbsent(key, _ => build)
    }
}
