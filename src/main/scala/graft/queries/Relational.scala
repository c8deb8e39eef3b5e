package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational query inventory over the TPC-H-ish tables.
  *
  * The reference (embeage/go-map-reduce) has no relational operators at all
  * (SURVEY.md §2.3) — group-by-key is its only aggregation and it has no
  * joins/windows/set-ops. These queries are the extension surface, expressed
  * declaratively so Catalyst supplies pushdown, pruning, partial aggregation
  * and join planning. Every aggregate double is `round(_, 2)` so the DuckDB
  * oracle hash-compares stably despite floating-point summation order.
  */
object Relational {

  /** q1_agg — TPC-H Q1 shape: scan-filter-aggregate on the fact table.
    * Partial (map-side) aggregation makes shuffle volume O(groups), not
    * O(rows) — the exact combiner the reference lacks (mrapps/wc.go:29-32).
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_discount), 2) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
