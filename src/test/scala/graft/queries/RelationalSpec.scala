package graft.queries

import graft.{SparkSuite, SparkEntry}
import org.apache.spark.sql.functions.{col, expr}

/** Sanity invariants per query at sf0.001. The strong correctness check is
  * the driver's DuckDB differential (oracleSql) — these specs guard the
  * invariants a hash compare can't state (e.g. semi+anti partition the
  * table) and keep `sbt test` meaningful offline.
  */
class RelationalSpec extends SparkSuite {

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query with an oracle has matching column names") {
    // The driver compare sorts columns by name; a query whose DataFrame
    // columns diverge from its SQL aliases hash-mismatches even when the
    // values agree. Guard the Spark side against accidental renames.
    val expected = Map(
      "q1_agg" -> Set("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "avg_qty", "avg_disc", "count_order"),
      "q3_topk" -> Set("c_custkey", "c_name", "revenue", "n_orders"),
      "q7_setops" -> Set("tag", "nationkey"),
      "q8_rollup" -> Set("status", "priority", "total", "n"))
    expected.foreach { case (name, cols) =>
      val got = SparkEntry.queries(name)(spark, sf).columns.toSet
      assert(got == cols, s"$name columns $got != $cols")
    }
  }

  test("semi and anti joins partition customer on the urgent-order predicate") {
    val total = graft.Tables.customer(spark, sf).count()
    val semiUrgent = Relational.q5SemiJoin(spark, sf).count() // urgent AND open
    val anti = Relational.q6AntiJoin(spark, sf).count()       // no urgent at all
    assert(semiUrgent <= total - anti, "semi(urgent&open) must fit inside has-urgent")
    assert(anti < total)
  }

  test("rollup grand total equals ungrouped sum") {
    import org.apache.spark.sql.functions._
    val roll = Relational.q8Rollup(spark, sf)
      .filter(col("status") === "ALL" && col("priority") === "ALL")
      .select("n").collect().head.getLong(0)
    val direct = graft.Tables.orders(spark, sf).count()
    assert(roll == direct)
  }

  test("grouping sets: each set's rows sum to the grand total, gid disambiguates") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q26GroupingSets(spark, sf).collect()
      .map(r => (r.getInt(r.fieldIndex("gid")), r.getLong(r.fieldIndex("n_lines"))))
    val total = graft.Tables.lineitem(spark, sf).count()
    // gid bit order: (l_returnflag, l_linestatus) → per-flag set = 1,
    // per-status set = 2, grand total = 3.
    assert(rows.collect { case (1, n) => n }.sum == total)
    assert(rows.collect { case (2, n) => n }.sum == total)
    assert(rows.collect { case (3, n) => n } sameElements Array(total))
    assert(rows.map(_._1).toSet == Set(1, 2, 3))
  }

  test("approx percentile tracks exact within 5%") {
    // Independent check on the RAW estimates vs the exact q17 (the entry
    // verifies the rank contract in-band since round 11 — this keeps the
    // value-level evidence that GK tracks the exact percentiles too).
    val exact = Relational.q17Percentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 10000)").cast("double").as("am"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").cast("double").as("ap90"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").cast("double").as("amp"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (m, p90, mp)) =>
      val (am, ap90, amp) = approx(k)
      assert(math.abs(am - m) <= 0.05 * math.abs(m) + 1)
      assert(math.abs(ap90 - p90) <= 0.05 * math.abs(p90) + 1)
      assert(math.abs(amp - mp) <= 0.05 * math.abs(mp) + 1)
    }
    // The entry's harness form: every rank-contract boolean true
    // (assert_true would have thrown on a violation), group counts real.
    val rows = Relational.q17bApproxPercentile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) > 0)
      Seq("median_qty_ok", "p90_qty_ok", "median_price_ok").foreach(c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"${r.getString(0)}: $c"))
    }
  }

  test("topk is ordered descending and bounded") {
    val rows = Relational.q3TopK(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }
}
