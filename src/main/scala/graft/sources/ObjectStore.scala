package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-store data plane, the Spark-native replacement for the
  * reference's hand-rolled S3 layer (mr/s3.go:20-124: manual download to
  * local file, upload after rename, bucket truncation).
  *
  * With Spark none of that is code: the same `spark.read.parquet(...)` /
  * `write` calls operate on `s3a://bucket/prefix` URIs once the Hadoop
  * S3A connector is configured. Committer note: on object stores the
  * rename-based commit the reference relies on (mr/worker.go:84-94) is a
  * copy; the magic committer commits via multipart-upload completion
  * instead — same exactly-once output contract, no copy.
  *
  * Untestable in this container (zero egress) — config-only, exercised by
  * pointing sfDir at an s3a:// prefix in a real deployment.
  */
object ObjectStore {

  /** Static-credential setup, mirroring the reference's .env AWS keys
    * (mr/s3.go:21-31). Prefer instance profiles / WebIdentity in real
    * clusters — then only `region` is needed.
    */
  def configureS3a(spark: SparkSession,
                   accessKey: Option[String] = None,
                   secretKey: Option[String] = None,
                   endpoint: Option[String] = None): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    accessKey.foreach(hc.set("fs.s3a.access.key", _))
    secretKey.foreach(hc.set("fs.s3a.secret.key", _))
    endpoint.foreach(hc.set("fs.s3a.endpoint", _))
    // Job-commit without rename-as-copy:
    hc.set("fs.s3a.committer.name", "magic")
    hc.set("spark.sql.parquet.output.committer.class",
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter")
    hc.set("spark.sql.sources.commitProtocolClass",
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol")
    // Scan tuning for high-latency stores:
    hc.set("fs.s3a.experimental.input.fadvise", "random") // parquet range reads
    hc.set("fs.s3a.connection.maximum", "96")
  }
}
