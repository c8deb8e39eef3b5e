package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round instrument: runs one query (warm-up + one timed
  * lap) and prints every Spark JOB the timed lap submits — wall ms,
  * description, stage count — plus the gaps between jobs (driver-side
  * work: plan construction, collects, manifest IO). The bench prices a
  * query as one wall number; this shows WHERE inside the lap the wall
  * goes, which at test scale is mostly job/barrier count (guide §1.1's
  * empirical loop, without a UI in the sandbox).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.JobBreakdown <query> [sfDir]"
  */
object JobBreakdown {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobBreakdown <query> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession("job-breakdown", s"local[$cpus]", cpus.toInt)

    def lap(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      s
    }
    lap() // warm-up: JIT, codegen cache, footer cache, in-process models
    lap() // second warm-up so the timed lap is JIT-quiet

    final case class J(id: Int, start: Long, var end: Long = -1L,
        var desc: String = "", var stages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, J(e.jobId, e.time, desc = d, stages = e.stageIds.size))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.currentTimeMillis()
    val wall = lap()
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val js = jobs.values.asScala.toSeq.sortBy(_.start)
    println(f"[jobs] $name wall=${wall}%.3f s, ${js.size} jobs")
    var prevEnd = t0
    js.foreach { j =>
      val gap = j.start - prevEnd
      val dur = if (j.end < 0) -1 else j.end - j.start
      println(f"[jobs]  gap=${gap}%5d ms | job ${j.id}%3d ${dur}%6d ms " +
        f"stages=${j.stages}%2d ${j.desc.take(90)}")
      prevEnd = math.max(prevEnd, if (j.end < 0) j.start else j.end)
    }
    println(f"[jobs]  tail gap=${t0 + (wall * 1000).toLong - prevEnd} ms")
    spark.stop()
  }
}
