package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

/** Execution-semantics probes — ports of the reference's framework-behavior
  * tests (SURVEY.md §2.2 A3/A4/A8, main/test-mr.sh):
  *
  *  - crash.go analogue: tasks that fail once are re-executed and the job's
  *    OUTPUT is exactly-once (Spark task retry + commit protocol replaces
  *    the reference's 10 s deadline + temp-file rename).
  *  - jobcount.go analogue: absent failures, each partition's side effects
  *    run exactly once (no speculation by default).
  *  - early_exit.sh analogue: output becomes visible atomically at job
  *    commit (_SUCCESS marker), never partially.
  */
class ChaosSpec extends SparkSuite {

  test("crash recovery: first-attempt failure is retried; result is exactly-once") {
    import spark.implicits._
    val data = (1L to 1000L).toDS().repartition(4)
    val out = data.mapPartitions { it =>
      val tc = TaskContext.get()
      // Fail every partition's first attempt — the reference's crash.go
      // kills ~1/3 of tasks; here deterministic for a stable test.
      if (tc.attemptNumber() == 0) throw new RuntimeException("injected crash")
      it
    }.as[Long].collect().sorted
    assert(out.toSeq == (1L to 1000L).toSeq, "retried job must produce exact output")
  }

  test("jobcount: exactly one execution per partition absent failures") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("taskRuns")
    val data = (1 to 800).toDS().repartition(8)
    data.foreachPartition { (_: Iterator[Int]) => acc.add(1) }
    assert(acc.value == 8, s"expected 8 task executions, saw ${acc.value}")
  }

  test("early exit: output is published atomically at job commit") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("graft-commit").toString
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .repartition(4)
      .write.mode("overwrite").parquet(out)
    val files = Files.list(Paths.get(out)).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(files.contains("_SUCCESS"), "job commit marker must exist")
    // No task-attempt temp dirs may survive commit.
    assert(!files.exists(_.startsWith("_temporary")), s"uncommitted temp data left: $files")
    val n = spark.read.parquet(out).count()
    assert(n == graft.Tables.documents(spark, sf).count())
  }
}
