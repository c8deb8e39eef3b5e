package graft.streaming

import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed view of an `events` row for streaming pipelines. Instant keeps the
  * full µs precision of the batch column.
  */
case class Event(event_id: Long, ts: Instant, user_id: Long,
                 event_type: String, value: Double)

/** One closed user session (timestamps in epoch micros for exact parity
  * with the batch Events.sessionize output).
  */
case class Session(user_id: Long, start_us: Long, end_us: Long,
                   n_events: Long, sum_value: Double, duration_us: Long)

/** Open-session state carried between triggers per user. */
case class SessionState(start_us: Long, last_us: Long, n: Long, sum: Double)

/** Structured Streaming forms of the Events queries. The reference engine
  * has no streaming at all (SURVEY.md §2.3) — this is extension surface:
  * event-time windows + watermarks for the windowed agg, and
  * flatMapGroupsWithState with an event-time timeout for sessionization
  * (state per user = one open session, O(users) state, unbounded input).
  */
object Streaming {

  val GapUs: Long = 30L * 60 * 1000000
  private val GapMs: Long = GapUs / 1000

  /** The `events` table as a file stream: same schema-adaptive ts handling
    * as the batch loader (Tables.events — epoch-nanos long vintage divides
    * to µs, timestamp[us] vintage passes through), schema pinned from a
    * batch read (streaming sources never infer). In production this is a
    * growing directory or a Kafka topic — the downstream pipelines are
    * identical.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // nanosAsLong is set at session build (GraftSession / SparkSuite) —
    // see Tables.events for the two-vintage ts contract.
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // File streams require a directory: stream the sf dir filtered to the
    // events file (a real deployment streams a dedicated directory/topic).
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    schema("ts").dataType match {
      case TimestampType => raw
      case TimestampNTZType =>
        // Session TZ is pinned UTC, so NTZ→LTZ is a no-op on the stored
        // micros — see Tables.events.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts drifted to unsupported dtype $other (expected " +
            "timestamp, timestamp_ntz, or epoch-nanos long); update Streaming.eventsStream")
    }
  }

  /** Incremental tumbling-window aggregation. The 1-hour watermark bounds
    * state: windows older than watermark-1h are finalized and dropped.
    * (countDistinct is not incrementally computable — the batch form's
    * n_users column is approx_count_distinct here.)
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"), col("n_users_approx"))

  /** Incremental SLIDING-window aggregation: 1-hour windows advancing every
    * 30 minutes, so each event lands in exactly 2 overlapping windows (the
    * smoothed rate/volume profile a monitoring pipeline charts). Same
    * bounded-state story as the tumbling form — the watermark finalizes and
    * evicts windows once they can no longer receive rows; the 2× row
    * amplification happens INSIDE the stateful aggregate's Expand, never as
    * a shuffle of duplicated raw events.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup on event_id: duplicates arriving within the
    * watermark horizon are dropped with bounded state (ids older than the
    * watermark are evicted — the streaming form of dd_exact for an
    * at-least-once ingest pipeline).
    */
  def dedupeStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases matched to same-user clicks in
    * the preceding hour. Both sides watermarked 2h — the join buffers each
    * side's rows only until the watermark passes the interval bound, so
    * state is bounded by (arrival skew + 1h) of traffic, not the stream.
    */
  def attributionJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") < col("p_ts"),
      "inner")
  }

  private def us(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** Per-trigger session update: merge state with the batch's events for
    * this user, emit every session closed by a gap, keep the trailing open
    * session in state with an event-time timeout at last+gap.
    */
  def updateSessions(userId: Long, events: Iterator[Event],
                     state: GroupState[SessionState]): Iterator[Session] = {
    def close(s: SessionState): Session =
      Session(userId, s.start_us, s.last_us, s.n, s.sum, s.last_us - s.start_us)

    if (events.isEmpty) {
      // Timeout fired: watermark passed last+gap, the open session is final.
      if (state.hasTimedOut && state.exists) {
        val out = close(state.get)
        state.remove()
        Iterator.single(out)
      } else Iterator.empty
    } else {
      val sorted = events.toSeq.sortBy(e => (us(e.ts), e.event_id))
      var open: Option[SessionState] = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = us(e.ts)
        open match {
          case Some(s) if t - s.last_us > GapUs =>
            closed += close(s)
            open = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            open = Some(SessionState(s.start_us, math.max(s.last_us, t),
              s.n + 1, s.sum + e.value))
          case None =>
            open = Some(SessionState(t, t, 1, e.value))
        }
      }
      val s = open.get
      state.update(s)
      state.setTimeoutTimestamp(s.last_us / 1000 + GapMs)
      closed.result().iterator
    }
  }

  /** Streaming sessionization: emits each session exactly once, when it is
    * closed by a later event or by the event-time timeout.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout())(
        updateSessions)
  }

}
