package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operations a 100 TB pipeline runs between queries.
  *
  * The reference never needs these (its corpus is 8 static files); at
  * petabyte scale the "small file problem" — millions of KB-sized parquet
  * files from incremental ingest — dominates scan cost (per-file open +
  * footer read + scheduler pressure), and unclustered data defeats parquet
  * row-group min/max pruning.
  */
object Maintenance {

  /** Compact a parquet directory into `nFiles` files RANGE-CLUSTERED on
    * `sortCol`: repartitionByRange gives files disjoint key ranges, and
    * sortWithinPartitions orders rows inside each file, so every parquet
    * row group carries tight min/max stats on the cluster key — a range
    * predicate then prunes whole files and row groups at scan time
    * (single-dimension Z-ordering). One shuffle, no driver-side data.
    */
  def compactAndCluster(spark: SparkSession, inDir: String, outDir: String,
      nFiles: Int, sortCol: String): Unit =
    spark.read.parquet(inDir)
      .repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(outDir)
}
