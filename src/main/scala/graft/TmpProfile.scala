package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: stage-level timing of embedCosineBucketed internals at sf0.1. */
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // Replicate internals (params for n=2000, t=0.45, miss=1e-3)
    val n = 2000L
    val bits = 7
    val p = 1.0 - math.acos(0.45) / math.Pi
    val p1 = math.pow(p, bits) + bits * math.pow(p, bits - 1) * (1 - p)
    val tables = math.min(48, math.ceil(math.log(1e-3) / math.log1p(-p1)).toInt)
    println(s"[prof] bits=$bits tables=$tables")
    val rnd = new scala.util.Random(5678)
    val planes = Array.fill(48, 20, 64)(rnd.nextGaussian())
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        graft.functions.vec.l2norm(col("embedding")).as("nrm"))
    def bucket(t: Int): Column =
      (0 until bits).map { b =>
        val plane = array(planes(t)(b).map(lit(_)).toIndexedSeq: _*)
        when(graft.functions.vec.dot(col("embedding"), plane) > 0, lit(1 << b))
          .otherwise(lit(0))
      }.reduce(_ + _)
    val sigs = e.select(
      col("vec_id") +: (0 until tables).map(t => bucket(t).as(s"b$t")): _*)
    time("sigs only")(sigs.write.format("noop").mode("overwrite").save())
    val keyed = sigs.select(col("vec_id").as("vec_b"),
      posexplode(array((0 until tables).map(t => col(s"b$t")): _*))
        .as(Seq("tbl", "bkt")))
    val probeKeys = (0 until tables).flatMap { t =>
      struct(lit(t).as("tbl"), col(s"b$t").as("bkt"), lit(true).as("ok")) +:
        (0 until bits).map(b =>
          struct(lit(t).as("tbl"),
            col(s"b$t").bitwiseXOR(lit(1 << b)).as("bkt"),
            (col(s"b$t").bitwiseAND(lit(1 << b)) === 0).as("ok")))
    }
    val probes = sigs.select(col("vec_id").as("vec_a"),
      explode(array(probeKeys: _*)).as("k"))
      .filter(col("k.ok"))
      .select(col("vec_a"), col("k.tbl").as("tbl"), col("k.bkt").as("bkt"))
    time("probes only")(probes.write.format("noop").mode("overwrite").save())
    val cands = probes.join(keyed, Seq("tbl", "bkt"))
      .filter(col("vec_a") =!= col("vec_b"))
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"))
      .distinct()
    val nc = time("join+distinct")(cands.count())
    println(s"[prof] candidates=$nc (all-pairs=${n * (n - 1) / 2})")
    val verified = cands
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b")), Seq("vec_b"))
      .withColumn("cs", graft.functions.vec.dot(col("emb_a"), col("emb_b"))
        / (col("nrm_a") * col("nrm_b")))
      .filter(col("cs") >= 0.45)
    time("full (verify incl upstream)")(verified.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
