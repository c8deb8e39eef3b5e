package graft

import org.apache.spark.sql.functions._

/** Scale techniques the 100 TB deployment leans on, demonstrated and
  * asserted on the local engine: bucketed co-located joins (no shuffle at
  * join time) and salted aggregation for skewed keys (identical results,
  * bounded per-key partition load).
  */
class ScaleTechniquesSpec extends SparkSuite {

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is a temp dir — set at session build; static conf)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // Force the sort-merge path (at real scale both sides are fact-sized
    // and broadcast is off the table anyway).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side, got:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans, got:\n$plan")

      // and it's still correct:
      val expected = Tables.lineitem(spark, sf).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted aggregation equals direct aggregation on skewed keys") {
    // l_returnflag has ~3 distinct values over 60k rows at sf0.01 — maximal
    // skew for a groupBy. Salting: shard each hot key 16 ways, aggregate
    // partials, then merge shards. Required when a single key's partial
    // state exceeds one executor (e.g. collect_list-style aggregates).
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap

    val salted = li
      .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("ps")).as("s"), sum(col("pn")).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap

    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n == direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6 * math.abs(s),
        s"salted sum for $k drifted: $s vs ${direct(k)._1}")
    }
  }

  test("salted join equals direct join on a skewed key") {
    // Skewed build side: every lineitem row joins l_returnflag (3 hot
    // keys). Salting a join = replicate the small side per salt shard so
    // each hot key's probe rows spread over 16 partitions.
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag"), col("l_quantity"))
    val dim = spark.createDataFrame(Seq(
      ("A", "returned"), ("N", "normal"), ("R", "refused")))
      .toDF("flag", "label")

    val direct = li.join(dim, col("l_returnflag") === col("flag"))
      .groupBy(col("label")).agg(sum(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val salts = spark.range(16).select(col("id").cast("int").as("salt"))
    val dimSalted = dim.crossJoin(salts)
    val liSalted = li.withColumn("salt",
      (pmod(col("l_quantity").cast("int") + length(col("l_returnflag")), lit(16))).cast("int"))
    val salted = liSalted.join(dimSalted,
      col("l_returnflag") === col("flag") && liSalted("salt") === dimSalted("salt"))
      .groupBy(col("label")).agg(sum(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, s) =>
      assert(math.abs(s - direct(k)) < 1e-6 * math.abs(s), s"$k drifted")
    }
  }

  test("AQE coalesces the tiny post-shuffle partitions") {
    val df = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey")).agg(sum(col("l_quantity")))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") || finalPlan.contains("coalesced"),
      s"expected AQE coalesced shuffle read in:\n$finalPlan")
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // Runtime complement of the manual salting tests above: one key holds
    // half the left side; with skew-join thresholds scaled to test data,
    // AQE must split that partition instead of letting one task drag the
    // stage (the automatic form of what salting does by hand at 100 TB).
    import spark.implicits._
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      val left = (1 to 120000)
        .map(i => (if (i % 2 == 0) 0L else i.toLong, s"payload-$i"))
        .toDF("k", "v")
      val right = (0 to 2000).map(i => (i.toLong, s"dim-$i")).toDF("k", "d")
      val joined = left.join(right, "k")
      // collect() executes joined's OWN queryExecution (count() would build
      // a separate one and leave this plan unfinalized).
      val n = joined.collect().length
      assert(n == 120000 / 2 + (1 to 120000).count(i => i % 2 == 1 && i <= 2000))
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE never marked the hot partition as skewed:\n$finalPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewed giant-component propagation: correct labels, log-bounded rounds") {
    // The SkewClusterProbe body, carried by `sbt test` so the probe can
    // never rot as unexecuted code (verdict r7 #3). run() asserts all
    // probe invariants internally (giant + background label correctness,
    // rounds ≤ 20 for a ~5,000-diameter component, and task balance over
    // the propagation-window stages — the balance clause skips stages
    // below 8 tasks, so under this suite's local[4] session it guards
    // plumbing; the full-width numbers come from the standalone main at
    // 32 partitions, committed per round).
    val stats = graft.queries.SkewClusterProbe.run(spark)
    info(s"skew probe: ${stats.json}")
    assert(stats.rounds >= 2, "a ~5,000-diameter component cannot close in 1 round")
  }
}
