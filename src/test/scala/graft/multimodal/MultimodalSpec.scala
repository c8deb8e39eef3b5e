package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("media table has opaque payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val row = m.filter(col("kind") === "image").head()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") >= 64)
    assert(m.select("kind").distinct().count() == 3)
  }

  test("binaryFile source ingests real files as opaque payloads (production media path)") {
    // The synthesized mediaTable stands in for what a real ingest produces
    // with spark.read.format("binaryFile") over an object-store prefix —
    // exercise that actual source: payload bytes round-trip exactly and
    // the pathGlobFilter prunes non-media files before any byte is read.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-media")
    val payloads = (0 until 5).map { i =>
      val bytes = Array.tabulate[Byte](100 + i * 37)(j => ((i * 31 + j) % 251).toByte)
      Files.write(dir.resolve(s"clip$i.bin"), bytes)
      s"clip$i.bin" -> bytes.toSeq
    }.toMap
    Files.write(dir.resolve("ignore.txt"), "not media".getBytes)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir.toString)
      .select(col("path"), col("length"), col("content"))
    val got = df.collect().map { r =>
      val name = r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
      name -> r.getAs[Array[Byte]]("content").toSeq
    }.toMap
    assert(got == payloads, "binary payloads must round-trip byte-exact")
    assert(!got.contains("ignore.txt"))
  }

  test("feature extraction is deterministic and batch-shaped") {
    def grab() = Multimodal.features(spark, sf).collect()
      .map(r => r.getLong(0) -> (3 until 11).map(r.getDouble)).toMap
    val f1 = grab()
    val f2 = grab()
    assert(f1 == f2, "stub decode must be deterministic")
    assert(f1.values.forall(_.length == 8))
    // payload bytes actually flowed through (nonzero features)
    assert(f1.values.exists(_.exists(_ > 0d)))
  }

  test("mm_features values match an independent plain-Scala byte-fold golden") {
    // Value-level anchor (same pattern as DedupSpec's all-pairs reference):
    // recompute every feature row with an independent fold over the raw
    // documents parquet, so a silent change to the stub decode, the
    // mapPartitions plumbing, or the scalar projection fails loudly —
    // determinism alone can't catch a deterministic-but-wrong refactor.
    import scala.math.BigDecimal.RoundingMode
    def goldenFold(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      payload.indices.foreach(i => acc(i % 8) += (payload(i) & 0xff) / 255.0f)
      val n = math.max(1, payload.length / 8)
      acc.map(_ / n)
    }
    val kinds = Array("image", "audio", "video")
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect().map { r =>
        val payload = r.getString(1).getBytes("UTF-8")
        (r.getLong(0), kinds((r.getLong(0) % 3).toInt), payload.length,
          goldenFold(payload).map(f =>  // Spark round() = HALF_UP on the double cast
            BigDecimal(f.toDouble).setScale(4, RoundingMode.HALF_UP).toDouble).toSeq)
      }.toSet
    val got = Multimodal.features(spark, sf).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), (3 until 11).map(r.getDouble).toSeq)).toSet
    assert(got == expected, "Spark mm_features diverged from the plain-Scala golden")
    assert(expected.nonEmpty)
  }

  test("resize preserves payload and shrinks only oversized images") {
    val r = Multimodal.resize(spark, sf).collect()
    r.foreach { row =>
      val w = row.getAs[Int]("new_width"); val h = row.getAs[Int]("new_height")
      assert(w <= 128 && h <= 128)
      assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    }
  }

  test("frame count equals ceil(duration/stride) per video") {
    val counts = Multimodal.frameSample(spark, sf)
      .groupBy("media_id", "duration_ms").count().collect()
    counts.foreach { row =>
      val expected = (row.getLong(1) + 999) / 1000
      assert(row.getLong(2) == expected,
        s"media ${row.getLong(0)}: ${row.getLong(2)} frames != $expected")
    }
    assert(counts.nonEmpty)
  }
}
