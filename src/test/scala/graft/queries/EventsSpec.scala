package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSuite {

  test("HLL sketch error is within the configured rsd against exact counts") {
    // Independent band check on the RAW estimate (the entry asserts the
    // same band in-band since round 11 — this keeps out-of-band evidence
    // that the band itself is honest, not self-referential).
    val raw = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("ap"),
        countDistinct(col("user_id")).as("ex"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(raw.nonEmpty)
    raw.foreach { case (k, ap, ex) =>
      // 0.05 rsd → allow 3 sigma
      assert(math.abs(ap.toDouble - ex) <= math.max(2.0, 0.15 * ex),
        s"$k: approx $ap vs exact $ex")
    }
    // The entry's harness form: exact column matches, sketch_ok all true
    // (assert_true would have thrown on a band violation).
    val rows = Events.approxSketch(spark, sf).collect()
    val exact = raw.map(t => t._1 -> t._3).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("users_exact")) == exact(r.getString(0)))
      assert(r.getBoolean(r.fieldIndex("sketch_ok")))
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

  test("retention: offset-0 cell equals cohort size, offsets non-negative") {
    val rows = Events.retention(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "negative day offset")
    // Every user is active on their own cohort day, so the offset-0 count
    // per cohort equals the cohort's size.
    val cohortSizes = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.date_trunc("day",
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min("day").as("cohort_day"))
      .groupBy("cohort_day").count().collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    rows.filter(_._2 == 0).foreach { case (day, _, n) =>
      assert(n == cohortSizes(day), s"cohort $day offset-0 $n != ${cohortSizes(day)}")
    }
  }

  test("anomaly rows all exceed 3 sigma for their own type") {
    val stats = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.avg("value").as("mu"),
        org.apache.spark.sql.functions.stddev_samp("value").as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Events.anomaly(spark, sf).collect()
    rows.foreach { r =>
      val (mu, sd) = stats(r.getString(1))
      // value is rounded to 2 in the output; re-derive z with slack.
      assert(math.abs((r.getDouble(2) - mu) / sd) > 2.9,
        s"event ${r.getLong(0)} not an outlier")
    }
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.nonEmpty, "no outliers at all — fixture signal lost")
    assert(rows.length < total / 20, "3-sigma flags should be rare")
  }

  test("markov transition probabilities sum to 1 per source state") {
    val rows = Events.markov(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, ts) =>
      val pSum = ts.map(_._4).sum
      // p is rounded to 4dp per row; tolerance scales with fan-out.
      assert(math.abs(pSum - 1.0) <= 1e-4 * ts.length + 1e-9,
        s"src $src probabilities sum to $pSum")
      assert(ts.map(_._2).distinct.length == ts.length, s"dup (src,dst) under $src")
    }
    // Transition counts conserve the total number of consecutive pairs:
    // every event with a successor contributes exactly one transition.
    val nPairs = rows.map(_._3).sum
    val events = graft.Tables.events(spark, sf)
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(nPairs == expected, s"pair count $nPairs != events-users $expected")
  }

  test("rolling 24h frame includes self and matches a per-user replay") {
    val out = Events.rolling(spark, sf)
    assert(out.filter(col("n_24h") < 1).isEmpty, "every event is in its own frame")
    // Replay one mid-sized user sequentially with a two-pointer window.
    val uid = graft.Tables.events(spark, sf).groupBy("user_id").count()
      .orderBy(col("count").desc).limit(1).collect().head.getLong(0)
    val evs = graft.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._2, e._1))
    val dayUs = 24L * 3600 * 1000000
    val expect = evs.map { case (id, us, _) =>
      val frame = evs.filter(e => e._2 >= us - dayUs && e._2 <= us)
      id -> ((frame.length.toLong,
        BigDecimal(frame.map(_._3).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = out.filter(col("user_id") === uid).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (n, v)) =>
      val (en, ev2) = expect(id)
      assert(n == en, s"event $id n_24h $n != $en")
      assert(math.abs(v - ev2) <= 0.011, s"event $id value_24h $v != $ev2")
    }
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

  test("paths: <=25 rows of valid 3-step paths, counts non-increasing") {
    val types = Set("view", "click", "purchase", "signup", "error")
    val rows = Events.paths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val steps = r.getString(0).split(">")
      assert(steps.length == 3 && steps.forall(types), s"bad path ${r.getString(0)}")
    }
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not ranked by n")
  }

  test("ab_test: z replays from a plain-Scala Welch computation per type") {
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1) % 2 == 0, r.getDouble(2)))
    def welch(xs: Array[Double], ys: Array[Double]): (Double, Double, Double) = {
      def meanVar(a: Array[Double]) = {
        val m = a.sum / a.length
        (m, a.map(x => (x - m) * (x - m)).sum / (a.length - 1))
      }
      val (ma, va) = meanVar(xs); val (mb, vb) = meanVar(ys)
      (ma, mb, (ma - mb) / math.sqrt(va / xs.length + vb / ys.length))
    }
    val expected = raw.groupBy(_._1).map { case (t, rows) =>
      val (a, b) = rows.partition(_._2)
      val (ma, mb, z) = welch(a.map(_._3), b.map(_._3))
      t -> (a.length.toLong, b.length.toLong, ma, mb, z)
    }
    val got = Events.abTest(spark, sf).collect()
    assert(got.nonEmpty && got.length == expected.size)
    got.foreach { r =>
      val (na, nb, ma, mb, z) = expected(r.getString(0))
      assert(r.getLong(1) == na && r.getLong(2) == nb)
      assert(math.abs(r.getDouble(3) - ma) < 5e-4, s"${r.getString(0)} mean_a")
      assert(math.abs(r.getDouble(4) - mb) < 5e-4, s"${r.getString(0)} mean_b")
      assert(math.abs(r.getDouble(5) - z) < 5e-4, s"${r.getString(0)} z")
    }
  }

  test("histogram: per-type bin counts partition the events exactly") {
    val rows = Events.histogram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) <= 19))
    val byType = rows.groupBy(_.getString(0)).map { case (t, rs) =>
      t -> rs.map(_.getLong(2)).sum
    }
    val expected = graft.Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == expected, "histogram bins must partition each type's rows")
  }
}
