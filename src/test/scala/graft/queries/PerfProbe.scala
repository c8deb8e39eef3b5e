package graft.queries

import org.apache.spark.sql.functions._

/** Scratch perf probe (Test scope, not shipped): times the stages of the
  * two queries BENCH flagged at sf0.1. Run:
  *   sbt "Test/runMain graft.queries.PerfProbe"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession("graft-perf-probe")
    def jvmStats(): String = {
      import scala.jdk.CollectionConverters._
      val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => s"${b.getName}:${b.getCollectionTime}ms").mkString(" ")
      val ct = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      s"gc[$gc] jit=${ct}ms heap=${heap.getUsed / (1 << 20)}/${heap.getMax / (1 << 20)}MB"
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ${jvmStats()}")
      r
    }
    // mm_features stages — per-kind FIRST (order sensitivity probe)
    val media = graft.multimodal.Multimodal.mediaIngest(spark, sfDir)
    t("mediaIngest staged read count")(media.count())
    Seq("audio", "video", "image").foreach { k =>
      t(s"mm_features $k only")(
        graft.multimodal.Multimodal.features(spark, sfDir)
          .filter(col("kind") === k)
          .write.format("noop").mode("overwrite").save())
    }
    t("mm_features full")(
      graft.multimodal.Multimodal.features(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    t("mm_features full lap2")(
      graft.multimodal.Multimodal.features(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    // dd_substring stages
    val grams = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 40)
      .select(col("doc_id"),
        explode(expr(
          """transform(sequence(1, length(text) - 39),
            |          i -> md5(substring(text, i, 40)))""".stripMargin)).as("g"))
      .distinct()
    t("substring grams count")(println("  grams=" + grams.count()))
    t("dd_substring full")(
      Dedup.substringDup(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    t("dd_substring full lap2")(
      Dedup.substringDup(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
