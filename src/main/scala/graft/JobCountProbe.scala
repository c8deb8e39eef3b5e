package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch instrument (VERDICT r8 #1 / r9 #5): count the Spark jobs and
  * stages a query launches — the cross-mode ratio suspect for ann_ivf is
  * per-job overhead on local-cluster, so the first question is "how many
  * jobs is it actually running, and which are broadcast builds?"
  *
  * Usage: runMain graft.JobCountProbe <queryName> [sfDir]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession("graft-jobcount")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val descs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        descs.add(s"job ${e.jobId}: ${e.stageInfos.size} stages " +
          s"[${e.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("; ")}]")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    })
    // warm lap (footer caches, codegen) then a counted lap
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    jobs.set(0); stages.set(0); descs.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    println(f"[jobcount] $name jobs=${jobs.get} stagesRun=${stages.get} wall=$sec%.2fs")
    descs.forEach(d => println(s"[jobcount]   $d"))
    spark.stop()
  }
}
