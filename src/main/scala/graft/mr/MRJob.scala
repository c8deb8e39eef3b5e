package graft.mr

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's single datum type: a schema-less string pair
  * (reference: mr/worker.go:15-18). Typed `Dataset[KV]` keeps the generic
  * MR API type-safe while staying inside Tungsten row encoding.
  */
case class KV(key: String, value: String)

/** Spark-native replacement for the reference's whole public API surface
  * (reference: mr/worker.go:180 `Worker(mapf, reducef)`,
  * mr/coordinator.go:202 `MakeCoordinator(files, nReduce)`, and the plugin
  * contract main/mrworker.go:34-51).
  *
  * The coordinator/worker/RPC/S3 plumbing of the reference collapses into
  * Spark internals: DAGScheduler gives the map-before-reduce barrier
  * (coordinator.go:105), task retry + FileCommitProtocol give at-least-once
  * execution with exactly-once output (worker.go:84-94), and the sort-based
  * shuffle replaces the nMap×nReduce JSON intermediate files (worker.go:86).
  *
  * Scale notes: `mapf` sees a whole file as one string — that is the
  * reference's semantic contract (worker.go:54-60), so per-file memory is
  * inherent to the API; `reducef` sees all values of a key, so a skewed key
  * materializes its value list exactly like the reference (worker.go:142-145).
  * The relational/query layer (graft.queries) never uses this API — it uses
  * algebraic aggregates that stream and combine map-side.
  */
object MRJob {

  /** flatMap(file → KVs) → shuffle by key → reduce(key, values) → KVs. */
  def run(spark: SparkSession,
          inputPaths: Seq[String],
          nReduce: Int,
          mapf: (String, String) => Seq[KV],
          reducef: (String, Seq[String]) => String): Dataset[KV] = {
    import spark.implicits._
    // Whole-file input: one record per file, exactly the reference's split
    // granularity (one map task per file, worker.go:41-60).
    val files: Dataset[(String, String)] =
      spark.read.option("wholetext", "true").text(inputPaths: _*)
        .select(input_file_name().as("path"), col("value"))
        .as[(String, String)]
    val mapped: Dataset[KV] = files.flatMap { case (path, contents) =>
      mapf(fileName(path), contents)
    }
    // groupByKey shuffles on key hash — the reference's fnv32a%nReduce
    // partitioning is semantically equivalent (SURVEY.md §1.3): the test
    // contract is per-key grouping, not bucket assignment.
    val reduced = mapped
      .groupByKey(_.key)
      .mapGroups { (k, it) => KV(k, reducef(k, it.map(_.value).toSeq)) }
    // nReduce controls output-partition (and thus sink-file) count parity.
    reduced.repartition(nReduce, col("key"))
  }

  /** Text sink with the reference's exact `"key value\n"` line format
    * (worker.go:151) — one part file per reduce partition mirrors
    * mr-out-<r>. Spark's FileCommitProtocol provides the same
    * temp-file + rename idempotent commit as worker.go:156-164.
    */
  def runToText(spark: SparkSession,
                inputPaths: Seq[String],
                nReduce: Int,
                mapf: (String, String) => Seq[KV],
                reducef: (String, Seq[String]) => String,
                outDir: String): Unit =
    run(spark, inputPaths, nReduce, mapf, reducef)
      .select(concat_ws(" ", col("key"), col("value")))
      .write.mode("overwrite").text(outDir)

  private def fileName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)
}

/** The two real applications shipped with the reference, re-expressed as
  * mapf/reducef pairs for the MR-compat API. The query layer re-expresses
  * both natively (graft.queries.TextQueries) — these exist for API parity
  * and the differential golden tests.
  */
object MRApps {
  /** Maximal runs of Unicode letters — Go's
    * `FieldsFunc(c, r => !unicode.IsLetter(r))` (mrapps/wc.go:23-26);
    * Java `\p{L}` matches the same category-L set.
    */
  val TokenPattern = "[^\\p{L}]+"
  def tokenize(contents: String): Array[String] =
    contents.split(TokenPattern).filter(_.nonEmpty)

  /** wc: emit (word,"1") per occurrence; count = number of values
    * (mrapps/wc.go:21-44). */
  val wcMap: (String, String) => Seq[KV] =
    (_, contents) => tokenize(contents).map(w => KV(w, "1")).toSeq
  val wcReduce: (String, Seq[String]) => String =
    (_, values) => values.size.toString

  /** indexer: per-doc distinct words → "<df> <doc1,doc2,...>"
    * (mrapps/indexer.go:20-39). */
  val indexerMap: (String, String) => Seq[KV] =
    (doc, contents) => tokenize(contents).distinct.map(w => KV(w, doc)).toSeq
  val indexerReduce: (String, Seq[String]) => String =
    (_, docs) => s"${docs.size} ${docs.sorted.mkString(",")}"
}
