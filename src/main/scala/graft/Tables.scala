package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. Loading is a plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning: filters and
  * projections land in the scan (`PushedFilters` / `ReadSchema`), and at
  * cluster scale the same call reads a partitioned directory unchanged.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped in two vintages of the driver testdata:
    * TIMESTAMP(NANOS) (which Spark 4 rejects outright, PARQUET_TYPE_ILLEGAL,
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` — set at session
    * build in GraftSession, since a loader must not mutate session conf as a
    * side effect) and plain timestamp[us]. Branch on the arriving dtype:
    * an epoch-nanos long is floor-divided to µs — integer division, since
    * 2024 epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact range — while a
    * native timestamp passes through untouched. DuckDB's
    * CAST(ts AS TIMESTAMP) handles both vintages the same way, keeping
    * oracles aligned. Normalizing here (not per-query) keeps the data
    * contract in one place; SchemaCanarySpec fails loud if a third vintage
    * ever appears.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case TimestampType => df
      case TimestampNTZType =>
        // timestamp[us] with isAdjustedToUTC=false infers as NTZ; the
        // session TZ is pinned UTC so this cast is a no-op on the stored
        // micros, and it keeps every downstream consumer (watermarks,
        // Instant encoders, unix_micros parity) on one timestamp type.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts drifted to unsupported dtype $other (expected " +
            "timestamp, timestamp_ntz, or epoch-nanos long); update Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}

/** Session factory with the settings this engine assumes everywhere.
  *
  * local[32] on the test box, but every knob is chosen for the 1000-executor
  * case: AQE re-plans skew/shuffle sizes at runtime, shuffle partitions track
  * cores (never the 200 default), and auto-broadcast stays on so dimension
  * tables (region/nation/...) never shuffle.
  */
object GraftSession {
  def apply(appName: String = "graft",
            master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
            shufflePartitions: Int = 32,
            extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Prefer hash joins over sort-merge wherever statistics allow
      // (round 13): the dedup/attach families join data-dependent pair
      // streams against bounded relations, and a sort of the stream is
      // pure waste — broadcast still wins when a side is small, and
      // stats-blind sites (checkpoint-descended relations) carry their
      // own explicit guarded-broadcast/SHUFFLE_HASH treatment.
      // Deliberately SESSION-wide, with the trade-off on record
      // (ADVICE r13): a ShuffledHashJoin build side cannot spill the
      // way sort-merge does, so a badly mis-estimated build side at
      // untested scale trades a sort for an executor OOM. Accepted
      // because (a) the conf only changes STATS-KNOWN joins, where the
      // planner still requires the build side to estimate under
      // spark.sql.shuffledHashJoinFactor × the other side — the blind
      // sites that motivated the sweep are all explicitly
      // guarded/hinted, (b) corpus×corpus self-joins that genuinely
      // need a spillable sort (dd_substring's admission join) carry no
      // hint and exceed the factor, keeping sort-merge, and (c) the
      // SmjScan join-strategy census runs in the per-round evidence
      // gate (round_probes.sh step 6), so a strategy flip on any heavy
      // query surfaces as an artifact diff, not a silent plan change.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // events.ts is TIMESTAMP(NANOS) parquet — Spark 4 rejects it unless
      // nanos are read as long (Tables.events then divides to µs).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
