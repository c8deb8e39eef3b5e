package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSuite {

  test("HLL sketch error is within the configured rsd against exact counts") {
    val approx = Events.approxSketch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      // 0.05 rsd → allow 3 sigma
      assert(math.abs(ap - ex) <= math.max(2.0, 0.15 * ex),
        s"$k: approx $ap vs exact $ex")
    }
  }

  test("range join returns one row per selected order, counts non-negative") {
    val rows = Events.rangeJoin(spark, sf).collect()
    val orders = rows.map(_.getLong(0))
    assert(orders.distinct.length == orders.length, "one row per order")
    assert(rows.forall(_.getLong(3) >= 0))
    assert(rows.nonEmpty)
  }

  test("funnel counts narrow monotonically and respect event order") {
    val r = Events.funnel(spark, sf).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v -> $c -> $p")
    assert(v > 0, "no users entered the funnel — fixture signal lost")
    val distinctUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(v <= distinctUsers)
  }

  test("sessions per user are non-overlapping and gap-separated") {
    val byUser = Events.sessionize(spark, sf).collect()
      .groupBy(_.getLong(0))
    byUser.values.foreach { ss =>
      val sorted = ss.sortBy(_.getTimestamp(2).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getTimestamp(2).getTime - a.getTimestamp(3).getTime
          assert(gapMs > 30 * 60 * 1000,
            s"sessions closer than gap: $gapMs ms for user ${a.getLong(0)}")
        case _ =>
      }
    }
  }
}
