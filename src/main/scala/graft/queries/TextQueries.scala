package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.mr.MRApps

/** The reference's two real queries (word count mrapps/wc.go, inverted index
  * mrapps/indexer.go) re-expressed as native DataFrame plans over the
  * `documents` table.
  *
  * Versus the reference's execution: `groupBy.count` runs partial (map-side)
  * aggregation, so shuffle volume is O(distinct words per partition) instead
  * of one record per word *occurrence* (the reference has no combiner —
  * mrapps/wc.go:29-32 ships every token across the shuffle). At 100 TB that
  * is the difference between a metadata-sized shuffle and a data-sized one.
  */
object TextQueries {

  /** wc — tokenize on non-letter runs, count occurrences per word. */
  def wordCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), MRApps.TokenPattern)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  val wordCountSql: String =
    raw"""SELECT word, count(*) AS cnt FROM (
         |  SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word FROM documents
         |) t WHERE word <> '' GROUP BY word""".stripMargin

  /** indexer — per-doc distinct terms → posting list + document frequency.
    * Posting lists sort numerically by doc_id, rendered as a CSV string so
    * the oracle hash compare is representation-stable across engines.
    * A skewed (stop-word-like) term concentrates its posting list on one
    * reducer, same as the reference (SURVEY.md §7 risk note); at scale the
    * df computation itself stays algebraic (count), only the list is held.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), MRApps.TokenPattern)).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .groupBy(col("word"))
      .agg(
        count(lit(1)).as("df"),
        array_join(
          transform(sort_array(collect_set(col("doc_id"))), _.cast("string")),
          ",").as("docs"))

  val invertedIndexSql: String =
    raw"""SELECT word, count(*) AS df,
         |  array_to_string(list_sort(list(doc_id)), ',') AS docs
         |FROM (SELECT DISTINCT doc_id, word FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
         |    FROM documents) t
         |  WHERE word <> '') d
         |GROUP BY word""".stripMargin
}
