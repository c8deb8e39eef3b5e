package graft.queries

import graft.SparkSuite

/** The staged-basis dispatch differential (round 17, VERDICT r16 #1):
  * `sharedBasis` must serve the staged compacted-shingle table when the
  * session names one staged from THIS corpus, fall back to recompute on
  * any mismatch, and be row-identical across the switch for every
  * signature-family consumer. The oracle surface never sets the conf,
  * so these are the only tests that exercise the staged arm — the
  * FuzzyCoarseCheck discipline: both regimes proven equal where the
  * dispatch lives, inert where the oracles run.
  */
class StagedBasisSpec extends SparkSuite {

  private def withStaging[A](dir: String)(body: => A): A =
    try {
      spark.conf.set(Dedup.StagingConfKey, dir)
      body
    } finally spark.conf.unset(Dedup.StagingConfKey)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("staged arm serves the staged table; outputs identical across the dispatch") {
    val staging = java.nio.file.Files.createTempDirectory("basis-staging").toString
    val recomputeMinhash = rows(Dedup.minhash(spark, sf))
    val recomputeFuzzy = rows(CorpusOps.decontaminateFuzzy(spark, sf))
    val recomputeDelta = rows(Dedup.deltaDedup(spark, sf))

    Dedup.stageBasis(spark, sf, staging)
    withStaging(staging) {
      // Engagement: the dispatch must actually READ the staged parquet,
      // not silently recompute — inputFiles of the served relation sit
      // under the staging dir.
      val served = Dedup.sharedBasis(spark, sf)
      assert(served.inputFiles.nonEmpty &&
        served.inputFiles.forall(_.contains(staging)),
        s"staged arm must scan $staging, got ${served.inputFiles.take(2).mkString(",")}")
      assert(served.schema("shingle").dataType ==
        org.apache.spark.sql.types.LongType,
        "staged basis must be the COMPACTED (long) form")

      assert(rows(Dedup.minhash(spark, sf)) == recomputeMinhash,
        "dd_minhash must be row-identical across the staged-basis dispatch")
      assert(rows(CorpusOps.decontaminateFuzzy(spark, sf)) == recomputeFuzzy,
        "dd_decontaminate_fuzzy must be row-identical across the dispatch")
      assert(rows(Dedup.deltaDedup(spark, sf)) == recomputeDelta,
        "dd_delta must be row-identical across the dispatch")
    }
  }

  test("provenance fence: a basis staged from another corpus is refused") {
    val staging = java.nio.file.Files.createTempDirectory("basis-foreign").toString
    // Stage from sf0.01, then ask for sf0.001 — the sidecar mismatch
    // must force the recompute arm (wrong-corpus rows would otherwise
    // flow straight into signatures).
    Dedup.stageBasis(spark, "/root/testdata/sf0.01", staging)
    withStaging(staging) {
      val served = Dedup.sharedBasis(spark, sf)
      assert(served.inputFiles.exists(_.contains("sf0.001")),
        "mismatched staging must fall back to recomputing from the corpus")
      // And the unstaged-equality still holds end-to-end.
      assert(rows(Dedup.minhash(spark, sf)) ==
        rows(withoutConf(Dedup.minhash(spark, sf))))
    }
  }

  test("generation fence: a basis staged from a regenerated corpus is refused") {
    // ADVICE r17 (medium): the path-only fence served a basis staged
    // from a PREVIOUS generation of the same sfDir. Simulate in-place
    // regeneration — same path, fresh file mtimes — on a tmp copy of
    // the corpus and assert the dispatch degrades to recompute.
    val corpusDir = java.nio.file.Files.createTempDirectory("basis-gen-corpus")
    // The driver tables are single parquet FILES; staged corpora are
    // directories — copy either shape.
    val srcDocs = new java.io.File(s"$sf/documents.parquet")
    val dstDocs = corpusDir.resolve("documents.parquet")
    if (srcDocs.isDirectory) {
      java.nio.file.Files.createDirectories(dstDocs)
      srcDocs.listFiles().filter(_.isFile).foreach { f =>
        java.nio.file.Files.copy(f.toPath, dstDocs.resolve(f.getName))
      }
    } else java.nio.file.Files.copy(srcDocs.toPath, dstDocs)
    val corpus = corpusDir.toString
    val staging = java.nio.file.Files.createTempDirectory("basis-gen-staging").toString
    Dedup.stageBasis(spark, corpus, staging)
    withStaging(staging) {
      val served = Dedup.sharedBasis(spark, corpus)
      assert(served.inputFiles.forall(_.contains(staging)),
        "fresh staging of the tmp corpus must be served")
    }
    // "Regenerate" in place: same path, same bytes, new mtimes.
    val dataFiles =
      if (dstDocs.toFile.isDirectory)
        dstDocs.toFile.listFiles().filter(_.isFile).toSeq
      else Seq(dstDocs.toFile)
    dataFiles.foreach(f => assert(f.setLastModified(f.lastModified() + 5000)))
    withStaging(staging) {
      val served = Dedup.sharedBasis(spark, corpus)
      assert(served.inputFiles.exists(_.contains(corpus)),
        "a basis staged from a previous corpus generation must recompute")
    }
  }

  test("missing or half-written staging is refused") {
    val staging = java.nio.file.Files.createTempDirectory("basis-empty").toString
    withStaging(staging) {
      val served = Dedup.sharedBasis(spark, sf)
      assert(served.inputFiles.exists(_.contains("sf0.001")),
        "a staging dir without table+sidecar must recompute")
    }
  }

  /** Evaluate under a guaranteed-unset conf (the fence tests run inside
    * withStaging, so "the recompute arm" needs explicit scoping).
    */
  private def withoutConf[A](body: => A): A = {
    val prev = spark.conf.getOption(Dedup.StagingConfKey)
    spark.conf.unset(Dedup.StagingConfKey)
    try body
    finally prev.foreach(spark.conf.set(Dedup.StagingConfKey, _))
  }
}
