package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) over a custom SparkPlan):
  * union both sides tagged, one window pass per key ordered by time
  * carrying the last-seen right-side value forward, keep left rows. This
  * is the scalable formulation: ONE shuffle on the key + a partition-local
  * sort — never the range-condition nested-loop a naive
  * `l.ts >= r.ts` join degenerates to (which Spark plans as
  * BroadcastNestedLoop/cartesian and explodes at any real scale).
  *
  * Tie rule: right rows sort before left rows at equal timestamps, giving
  * inclusive `left.ts >= right.ts` semantics — identical to DuckDB's
  * ASOF JOIN used as the oracle.
  */
object AsOfJoin {

  /** Generic form: for each left row, attach `valueCols` from the latest
    * right row with rightTime <= leftTime (per key).
    */
  def asof(left: DataFrame, right: DataFrame,
           key: String, leftTime: String, rightTime: String,
           valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.select(
      (col(key) +: (col(rightTime).as("__t") +: valueCols.map(c => col(c).as(s"__v_$c")))): _*)
      .withColumn("__side", lit(0))
    val lAligned = l.select(
      (l.columns.toIndexedSeq.filterNot(valueCols.map(v => s"__v_$v").contains).map(col) ++
        valueCols.map(c => lit(null).cast(r.schema(s"__v_$c").dataType).as(s"__v_$c"))): _*)
    val unioned = lAligned.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("__side") === 1)
    out.select(
      (left.columns.toIndexedSeq.map(col) ++
        valueCols.map(c => col(s"__asof_$c").as(s"asof_$c"))): _*)
  }

  /** q14_asof — for each event, the customer's most recent order date at
    * event time, plus whole days elapsed. (Order date is the asof value
    * itself, so ties on (custkey, orderdate) cannot make the result
    * nondeterministic.)
    */
  def query(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
      // Dedup to the per-(user, date) grain first: cheap, and makes the
      // carried value unique per timestamp.
      .distinct()
    asof(ev, ord, "user_id", "ts", "o_orderdate", Seq("o_orderdate"))
      .select(col("event_id"), col("user_id"),
        col("asof_o_orderdate").as("last_order_date"),
        expr("(unix_micros(ts) - unix_micros(CAST(asof_o_orderdate AS TIMESTAMP))) DIV 86400000000")
          .as("days_since"))
  }

  val querySql: String =
    """SELECT e.event_id, e.user_id,
      |  o.o_orderdate AS last_order_date,
      |  (epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(o.o_orderdate)) // 86400000000
      |    AS days_since
      |FROM events e
      |ASOF JOIN (SELECT DISTINCT o_custkey, o_orderdate FROM orders) o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin
}
