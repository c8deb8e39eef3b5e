package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-key stress for dd_clusters' component propagation (round-6
  * verdict #8).
  *
  * The realistic skew for near-dup clustering is ONE giant component —
  * the boilerplate/template case where thousands of docs share a label.
  * Propagation groups by `doc_a` and joins through the label table, so a
  * giant component concentrates a single hot label key as it converges.
  * This probe builds a 10,001-node giant component shaped to stress both
  * axes — a 5,000-spoke star at node 0 (instant hot key) with a
  * 5,000-node chain hanging off it (diameter, exercising the
  * pointer-doubling log bound) — plus 1,000 background 5-node path
  * components, and asserts:
  *
  *   1. correctness: every giant-component node labels to 0; background
  *      components label to their min id;
  *   2. the doubling bound: rounds ≤ 20 for a ~5,000-diameter graph
  *      (25-round cap would never close it without doubling);
  *   3. task-time balance, via listener: in every propagation stage with
  *      ≥ 8 tasks and non-trivial work, the slowest task stays within
  *      20× the stage median (+100 ms noise floor) — the loud failure
  *      mode would be one task carrying the whole hot key while 31 idle.
  *      The assertion is scoped to stages of jobs launched INSIDE the
  *      propagation loop (tracked by job group) — a straggler in fixture
  *      staging or the final collect cannot fail it spuriously
  *      (ADVICE r7 #4).
  *
  * AQE's skew-join splitting only engages past size thresholds this
  * fixture cannot reach (256 MB partitions); what IS measurable at test
  * scale is that the hash-partitioned join/agg shape distributes the hot
  * label's EDGES across tasks (the groupBy key is doc_a, not label, so
  * the hot label never collapses into one partition's reduce).
  *
  * The probe body is `run(spark)`, shared by the standalone main (emits
  * the SKEW_CLUSTER_PROBE_OK artifact line) and ScaleTechniquesSpec's
  * test (verdict r7 #3: carried by `sbt test`, so it can never silently
  * rot as unexecuted code again).
  *
  * Run: sbt "Test/runMain graft.queries.SkewClusterProbe"
  */
object SkewClusterProbe {

  final case class Stats(rounds: Int, wallSec: Double, worstMaxOverMedian: Double,
      propagationStages: Int, allStages: Int) {
    def json: String =
      s"""{"rounds":$rounds,""" +
        f""""wallSec":$wallSec%.2f,"worstMaxOverMedian":$worstMaxOverMedian%.1f,""" +
        s""""propagationStages":$propagationStages,"allStages":$allStages}"""
  }

  /** Builds the fixture, runs the propagation under a job group, asserts
    * all three probe invariants (via require — throws on violation), and
    * returns the measured stats.
    */
  def run(spark: SparkSession): Stats = {
    // --- fixture -----------------------------------------------------------
    val star = spark.range(1L, 5001L)
      .select(lit(0L).as("doc_a"), col("id").as("doc_b"))
    val chain = spark.range(5000L, 10000L)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // 1,000 background 5-node paths at ids 100000+, min id = base of each.
    val background = spark.range(0L, 1000L * 4)
      .select((lit(100000L) + expr("id DIV 4") * 10 + expr("id % 4")).as("doc_a"),
        (lit(100000L) + expr("id DIV 4") * 10 + expr("id % 4") + 1).as("doc_b"))
    val pairs = star.union(chain).union(background)

    // --- listener ----------------------------------------------------------
    val taskMs = new ConcurrentHashMap[Int, java.util.List[Long]]()
    val propagationStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        if (e.properties != null &&
            "skew-propagate" == e.properties.getProperty("spark.jobGroup.id"))
          e.stageIds.foreach(propagationStages.add(_))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        taskMs.computeIfAbsent(e.stageId,
          _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]()))
          .add(e.taskInfo.duration)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobGroup("skew-propagate",
        "dd_clusters pointer-doubled propagation (skew probe window)")
      val (labels, rounds) =
        // smallGraphCeiling = 0: the probe measures the DISTRIBUTED
        // loop's skew/doubling behavior — the round-19 driver fast path
        // would otherwise absorb this output-class fixture.
        try Dedup.propagateComponentsWithRounds(pairs, smallGraphCeiling = 0L)
        finally spark.sparkContext.clearJobGroup()
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      // Deterministic barrier: all task-end events delivered (was a fixed
      // 1.5 s sleep that taxed every `sbt test` run).
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)

      // --- 1. correctness --------------------------------------------------
      val giantOk = (0L to 10000L).forall(i => got(i) == 0L)
      val bgOk = (0 until 1000).forall { c =>
        val base = 100000L + c * 10
        (0 to 4).forall(j => got(base + j) == base)
      }
      require(giantOk, "giant component did not fully label to node 0")
      require(bgOk, "a background component mislabeled")

      // --- 2. doubling bound -----------------------------------------------
      println(s"[skewprobe] rounds=$rounds wall=${f"$secs%.2f"}s " +
        s"nodes=${got.size} (giant 10001 + background 5000)")
      require(rounds <= 20,
        s"propagation needed $rounds rounds for diameter ~5000 — doubling broken")

      // --- 3. task-time balance --------------------------------------------
      import scala.jdk.CollectionConverters._
      var worst = 0.0
      val inWindow = taskMs.asScala.toSeq.filter(e => propagationStages.contains(e._1))
      require(inWindow.nonEmpty, "job-group window captured no propagation stages")
      val offenders = inWindow.sortBy(_._1).flatMap { case (stage, l) =>
        val ds = l.asScala.map(_.toLong).toSeq.sorted
        if (ds.size < 8) None
        else {
          val median = ds(ds.size / 2).max(1L)
          val ratio = ds.last.toDouble / median
          worst = math.max(worst, ratio)
          if (ds.last > 100 && ratio > 20) Some((stage, ds.last, median))
          else None
        }
      }
      println(f"[skewprobe] stages=${inWindow.size}/${taskMs.size()} " +
        f"worstMaxOverMedian=$worst%.1f (propagation-window stages only)")
      require(offenders.isEmpty,
        s"skewed stages (stage, maxMs, medianMs): $offenders")

      Stats(rounds, secs, worst, inWindow.size, taskMs.size())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("skew-cluster-probe")
    val stats = run(spark)
    println(s"SKEW_CLUSTER_PROBE_OK ${stats.json}")
    spark.stop()
  }
}
