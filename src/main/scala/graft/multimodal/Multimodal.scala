package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` payloads plus a
  * typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * processing, metadata propagation — is real and tested. The pixel/sample
  * DECODE ITSELF IS A STUB (this container ships no image/audio codecs):
  * `stubDecodeFeatures` derives deterministic pseudo-features from the
  * payload bytes. Swapping in a real codec touches exactly one function.
  *
  * At scale: payloads stay opaque bytes end-to-end (no row-level object
  * churn), per-partition processing amortizes any codec init cost across
  * the partition (the reason for mapPartitions over a per-row UDF), and
  * metadata predicates (kind/width/duration) are plain columns — pushed
  * down to the scan, so a "videos longer than 30 s" filter never reads
  * payload bytes from parquet (column pruning).
  */
object Multimodal {

  /** media(media_id, kind, payload: binary, meta: struct) — synthesized
    * deterministically from `documents` (payload = utf-8 text bytes; kind
    * and dimensions derived from doc_id). Stands in for a real ingest of
    * s3://bucket/media/... objects.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (lit(64) + col("doc_id") % 193).cast("int").as("width"),
        (lit(64) + col("doc_id") % 129).cast("int").as("height"),
        (lit(8000) + (col("doc_id") % 5) * lit(8000)).cast("int").as("sample_rate"),
        (lit(1000) + col("doc_id") % 59 * lit(997)).as("duration_ms")).as("meta"))

  /** Typed row for the partition-wise decode stage. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           feature: Array[Float])

  /** STUB decode: deterministic 8-dim pseudo-embedding from payload bytes.
    * A real implementation would decode pixels/samples here; everything
    * around it (batching, schema, parallelism) is production-shaped.
    */
  private def stubDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, payload.length / 8)
    out.map(_ / n)
  }

  /** mm_features — per-partition feature extraction over binary payloads.
    * mapPartitions (not a row UDF): codec/model init happens once per
    * partition, rows stream through in one pass.
    *
    * The 8-dim feature vector is emitted as SCALAR columns f0..f7
    * (rounded) rather than array<float>: downstream row-wise consumers —
    * including the driver's pandas-based compare, which cannot sort an
    * array column — get plain orderable doubles. Array-shaped consumers
    * (ANN ingest) re-pack with array(f0..f7).
    */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir).select(
      col("media_id"), col("kind"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
    val scalars = (0 until 8).map(i =>
      round(element_at(col("feature"), i + 1).cast("double"), 4).as(s"f$i"))
    media.mapPartitions { rows =>
      // (real codecs would initialize HERE, once per partition)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          stubDecodeFeatures(r.payload))
      }
    }.toDF()
      .select(col("media_id") +: col("kind") +: col("n_bytes") +: scalars: _*)
  }

  /** mm_resize — metadata-tracked resize. Payload transform is the stub
    * (identity); the metadata arithmetic + pruning-friendly projection are
    * the real plumbing under test.
    */
  def resize(spark: SparkSession, sfDir: String, maxSide: Int = 128): DataFrame = {
    val m = mediaTable(spark, sfDir)
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double"))
    m.filter(col("kind") === "image")
      .select(
        col("media_id"),
        col("payload"),
        floor(col("meta.width") * scale).cast("int").as("new_width"),
        floor(col("meta.height") * scale).cast("int").as("new_height"),
        round(scale, 6).as("scale"))
  }

  /** mm_frames — frame sampling for videos: one row per sampled frame at a
    * fixed 1000 ms stride. sequence+explode is pure Catalyst (no UDF);
    * the per-frame decode would be the stub stage downstream.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val strideMs = 1000L
    mediaTable(spark, sfDir)
      .filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(strideMs)))
          .as("frame_ts_ms"))
  }

  /** mm_audio_windows — fixed-length analysis windows for audio: one row
    * per 250 ms hop with sample offsets derived from the sample rate (the
    * STFT-style framing a feature extractor consumes). Pure metadata
    * arithmetic + sequence/explode — decode itself stays in the stub stage.
    */
  def audioWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val hopMs = 250L
    mediaTable(spark, sfDir)
      .filter(col("kind") === "audio")
      .select(col("media_id"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(hopMs)))
          .as("win_start_ms"))
      .withColumn("start_sample",
        (col("win_start_ms") * col("sample_rate") / lit(1000)).cast("long"))
      .withColumn("n_samples",
        (least(col("win_start_ms") + hopMs, col("duration_ms")) - col("win_start_ms"))
          * col("sample_rate") / lit(1000))
      .withColumn("n_samples", col("n_samples").cast("long"))
  }

  val audioWindowsSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    CAST(8000 + (doc_id % 5) * 8000 AS INT) AS sample_rate,
      |    1000 + doc_id % 59 * 997 AS duration_ms
      |  FROM documents)
      |SELECT media_id, sample_rate, duration_ms,
      |  unnest(range(0, duration_ms, 250)) AS win_start_ms,
      |  CAST(unnest(range(0, duration_ms, 250)) * sample_rate / 1000 AS BIGINT) AS start_sample,
      |  CAST((least(unnest(range(0, duration_ms, 250)) + 250, duration_ms)
      |    - unnest(range(0, duration_ms, 250))) * sample_rate / 1000 AS BIGINT) AS n_samples
      |FROM media WHERE kind = 'audio'""".stripMargin

  /** Oracle for the frame sampler (metadata plumbing is SQL-expressible;
    * kind/duration derivations restated verbatim).
    */
  val frameSampleSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    1000 + doc_id % 59 * 997 AS duration_ms
      |  FROM documents)
      |SELECT media_id, duration_ms, unnest(range(0, duration_ms, 1000)) AS frame_ts_ms
      |FROM media WHERE kind = 'video'""".stripMargin

  /** Oracle for resize metadata (payload excluded — binary compare is not
    * hash-stable across engines; asserted in MultimodalSpec instead).
    */
  val resizeMetaSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    CAST(64 + doc_id % 193 AS INT) AS width,
      |    CAST(64 + doc_id % 129 AS INT) AS height
      |  FROM documents)
      |SELECT media_id,
      |  CAST(floor(width * least(1.0, 128.0 / greatest(width, height))) AS INT) AS new_width,
      |  CAST(floor(height * least(1.0, 128.0 / greatest(width, height))) AS INT) AS new_height,
      |  round(least(1.0, 128.0 / greatest(width, height)), 6) AS scale
      |FROM media WHERE kind = 'image'""".stripMargin

  /** mm_resize_meta — the oracle-checkable projection of resize. */
  def resizeMeta(spark: SparkSession, sfDir: String): DataFrame =
    resize(spark, sfDir).drop("payload")
}
