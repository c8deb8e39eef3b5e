package graft.mr

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Differential golden tests, the port of the reference's test-mr.sh scheme
  * (main/test-mr.sh:64-131): the distributed result must equal a
  * single-threaded sequential oracle (port of main/mrsequential.go),
  * compared order-insensitively (the harness `sort`s outputs before cmp).
  */
class MRJobSpec extends SparkSuite {

  /** Sequential oracle — read all files, map, global sort, group adjacent,
    * reduce (main/mrsequential.go:25-87). */
  private def sequential(paths: Seq[String],
                         mapf: (String, String) => Seq[KV],
                         reducef: (String, Seq[String]) => String): Seq[(String, String)] = {
    val intermediate = paths.flatMap { p =>
      val contents = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
      mapf(p.substring(p.lastIndexOf('/') + 1), contents)
    }.sortBy(_.key)
    intermediate.groupBy(_.key).toSeq.map { case (k, kvs) =>
      k -> reducef(k, kvs.map(_.value))
    }
  }

  private val corpus: Seq[String] = {
    val dir = Paths.get("/root/reference/main")
    Files.list(dir).iterator().asScala
      .map(_.toString).filter(_.matches(".*/pg-.*\\.txt")).toSeq.sorted
  }

  private def distributed(mapf: (String, String) => Seq[KV],
                          reducef: (String, Seq[String]) => String): Seq[(String, String)] =
    MRJob.run(spark, corpus, 10, mapf, reducef)
      .collect().toSeq.map(kv => (kv.key, kv.value))

  test("corpus present") { assert(corpus.size == 8) }

  test("wc: distributed equals sequential oracle over pg corpus") {
    val got = distributed(MRApps.wcMap, MRApps.wcReduce).sorted
    val want = sequential(corpus, MRApps.wcMap, MRApps.wcReduce).sorted
    assert(got.size == want.size)
    assert(got == want)
  }

  test("indexer: distributed equals sequential oracle over pg corpus") {
    val got = distributed(MRApps.indexerMap, MRApps.indexerReduce).sorted
    val want = sequential(corpus, MRApps.indexerMap, MRApps.indexerReduce).sorted
    assert(got == want)
  }

  test("wc spot checks: known counts stay stable") {
    val counts = distributed(MRApps.wcMap, MRApps.wcReduce).toMap
    // Every word occurs at least once and counts are positive integers.
    assert(counts.nonEmpty)
    assert(counts.values.forall(v => v.toInt > 0))
    // 'the' is the most frequent English token in any Gutenberg corpus.
    val the = counts("the").toInt
    assert(counts.values.map(_.toInt).max == the)
  }

  test("tokenizer: letters-only runs, Unicode category L") {
    assert(MRApps.tokenize("a b,c;d").toSeq == Seq("a", "b", "c", "d"))
    assert(MRApps.tokenize("héllo wörld").toSeq == Seq("héllo", "wörld"))
    assert(MRApps.tokenize("x1y2z").toSeq == Seq("x", "y", "z"))
    assert(MRApps.tokenize("").toSeq == Seq())
    assert(MRApps.tokenize("123 456").toSeq == Seq())
  }

  test("crash analogue: first-attempt task failure still yields golden wc output") {
    // Port of test-mr.sh:270-317 (crash.so): tasks die mid-flight, the job
    // must still byte-match the no-crash oracle. Deterministic injection —
    // every partition's first attempt throws (heavier than the reference's
    // ~33% random exits); local[4,2] retries make the job complete.
    val attempted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val crashingMap: (String, String) => Seq[KV] = (doc, contents) => {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && attempted.add(tc.partitionId())) {
        throw new RuntimeException("injected crash (crash.go analogue)")
      }
      MRApps.wcMap(doc, contents)
    }
    val got = MRJob.run(spark, corpus, 10, crashingMap, MRApps.wcReduce)
      .collect().toSeq.map(kv => (kv.key, kv.value)).sorted
    val want = sequential(corpus, MRApps.wcMap, MRApps.wcReduce).sorted
    assert(got == want, "crash-retried output must equal the sequential oracle")
  }

  test("nReduce controls output partition count (mr-out-<r> parity)") {
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("mrout-n").toString
    MRJob.runToText(spark, corpus.take(2), 10, MRApps.wcMap, MRApps.wcReduce, out)
    val parts = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString)
      .count(f => f.startsWith("part-") && !f.endsWith(".crc"))
    assert(parts == 10, s"expected 10 output partitions (nReduce), got $parts")
  }

  test("runToText writes reference line format 'key value'") {
    val out = Files.createTempDirectory("mrout").toString
    MRJob.runToText(spark, corpus.take(1), 3, MRApps.wcMap, MRApps.wcReduce, out)
    val lines = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-")
        && !p.getFileName.toString.endsWith(".crc"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(lines.nonEmpty)
    assert(lines.forall(_.matches("\\S+ \\S+")))
  }
}
