package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float] column). Two paths:
  *
  *   ann_topk — brute-force cosine top-k: broadcast the (small) query set
  *              against the full corpus. Exact; the recall baseline. Scales
  *              as O(|Q|·N) with no shuffle beyond the final per-query top-k
  *              (window over q_id — each query's candidates land on one
  *              partition, |Q| partitions in flight).
  *   ann_ivf  — inverted-file index: corpus is bucketed by nearest coarse
  *              centroid, queries probe the 3 nearest cells. Cost drops to
  *              O(N·C) assignment (one pass, broadcast centroids) +
  *              O(|Q|·N·nprobe/C) search. The 100 TB path: cells become
  *              partition keys, so a query touches nprobe partitions only.
  *
  * All vector math is higher-order-function columns (zip_with/aggregate) —
  * doubles summed in index order, no UDFs.
  */
object Similarity {

  private val K = 5
  private val NProbe = 5

  /** Corpus with the L2 norm computed once per vector — every downstream
    * pair evaluation is then a single dot product (norm-per-pair triples
    * the array passes across |Q|·N pairs).
    */
  private def normed(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"),
      graft.functions.vec.l2norm(col("embedding")).as("nrm"))

  private def pairCosine: org.apache.spark.sql.Column =
    graft.functions.vec.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))

  /** Deterministic query set: every 50th vector. */
  private def queries(e: DataFrame): DataFrame =
    normed(e).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))

  /** ann_topk — exact brute-force top-5 cosine neighbors per query. */
  def annTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = normed(Tables.embeddings(spark, sfDir))
    val q = queries(Tables.embeddings(spark, sfDir))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cs_raw").desc, col("vec_id"))
    broadcast(q).join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cs_raw", pairCosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cs_raw"), 6).as("cs"))
  }

  val annTopKSql: String =
    s"""SELECT q_id, neighbor_id, rank, cs FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |        CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS INT) AS rank,
       |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |      CAST(e.embedding AS DOUBLE[])), 6) AS cs
       |  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id % 50 = 0) t
       |WHERE rank <= $K""".stripMargin

  /** ann_ivf_kmeans — IVF with TRAINED coarse centroids: MLlib KMeans
    * (cosine distance, fixed seed, 5 Lloyd iterations) instead of sampled
    * corpus vectors. The "query" includes index build — honest for the
    * bench, and at 100 TB the model trains on a sample once per ingest and
    * is broadcast. k scales as N/48 (matching ann_ivf's sampling density).
    * Approximate → rows-only; SimilaritySpec asserts recall ≥ the sampled
    * variant's floor.
    */
  def annIvfKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val raw = Tables.embeddings(spark, sfDir)
    val n = raw.count()
    val k = math.max(8, (n / 48).toInt)
    val withVec = raw.withColumn("features",
      array_to_vector(transform(col("embedding"), _.cast("double"))))
    val model = new KMeans().setK(k).setSeed(42).setMaxIter(5)
      .setDistanceMeasure("cosine").fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("prediction").as("cell"), col("vec_id"), col("embedding"),
        graft.functions.vec.l2norm(col("embedding")).as("nrm"))
    val cents = spark.createDataFrame(
      model.clusterCenters.toIndexedSeq.zipWithIndex.map { case (v, i) => (i, v.toArray) })
      .toDF("cent_id", "cent_emb")
      .withColumn("cent_nrm", graft.functions.vec.l2norm(col("cent_emb")))
    val q = queries(Tables.embeddings(spark, sfDir))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qcs").desc, col("cent_id"))
    val probed = q.join(broadcast(cents))
      .withColumn("qcs", graft.functions.vec.dot(col("q_emb"), col("cent_emb"))
        / (col("q_nrm") * col("cent_nrm")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= NProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cs_raw").desc, col("vec_id"))
    broadcast(probed).join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cs_raw", pairCosine)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cs_raw"), 6).as("cs"))
  }

  /** ann_lsh — random-hyperplane LSH ANN: L tables × B sign bits. A
    * vector's bucket in table t is the B-bit sign pattern against that
    * table's hyperplanes; candidates share a bucket in ANY table
    * (OR-amplification). Hyperplanes are seeded-deterministic. At scale
    * the bucket id is a partition key: a query probes L partitions total,
    * independent of corpus size. Approximate → rows-only + recall spec.
    */
  private val LshTables = 8
  private val LshBits = 5
  private val Dim = 64

  private lazy val hyperplanes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(1234)
    Array.fill(LshTables, LshBits, Dim)(rnd.nextGaussian())
  }

  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = normed(Tables.embeddings(spark, sfDir))
    // bucket_t = Σ_b (dot(v, h_tb) > 0) << b, as pure column arithmetic
    def bucket(t: Int): org.apache.spark.sql.Column =
      (0 until LshBits).map { b =>
        val plane = array(hyperplanes(t)(b).map(lit(_)).toIndexedSeq: _*)
        when(graft.functions.vec.dot(col("embedding"), plane) > 0, lit(1 << b))
          .otherwise(lit(0))
      }.reduce(_ + _)
    val buckets = (0 until LshTables).map(t =>
      struct(lit(t).as("tbl"), bucket(t).as("bkt")))
    val keyed = e.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(buckets: _*)).as("k"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("k.tbl").as("tbl"), col("k.bkt").as("bkt"))
    val q = keyed.join(
      e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id")), col("vec_id") === col("q_id"))
      .select(col("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
        col("tbl"), col("bkt"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cs_raw").desc, col("vec_id"))
    broadcast(q).join(keyed, Seq("tbl", "bkt"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("vec_id"), col("embedding"), col("nrm"))
      .distinct() // a pair may collide in several tables
      .withColumn("cs_raw", pairCosine)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cs_raw"), 6).as("cs"))
  }

  /** ann_ivf — IVF-style ANN. Coarse centroids are corpus vectors sampled
    * deterministically (every 47th), so centroid count scales with the
    * corpus. Approximate → no SQL oracle (driver rows-only); SimilaritySpec
    * asserts recall@5 against ann_topk.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = normed(Tables.embeddings(spark, sfDir))
    val cents = e.filter(col("vec_id") % 47 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        col("nrm").as("cent_nrm"))
    def centCosine = graft.functions.vec.dot(col("embedding"), col("cent_emb")) /
      (col("nrm") * col("cent_nrm"))
    // Assignment pass: nearest centroid per corpus vector (broadcast C).
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccs").desc, col("cent_id"))
    val assigned = e.join(broadcast(cents))
      .withColumn("ccs", centCosine)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("cent_id").as("cell"), col("vec_id"), col("embedding"), col("nrm"))
    // Query probing: nprobe nearest cells per query.
    val q = queries(Tables.embeddings(spark, sfDir))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qcs").desc, col("cent_id"))
    val probed = q.join(broadcast(cents))
      .withColumn("qcs", graft.functions.vec.dot(col("q_emb"), col("cent_emb"))
        / (col("q_nrm") * col("cent_nrm")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= NProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cent_id").as("cell"))
    // Search within probed cells only.
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cs_raw").desc, col("vec_id"))
    broadcast(probed).join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cs_raw", pairCosine)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cs_raw"), 6).as("cs"))
  }
}
