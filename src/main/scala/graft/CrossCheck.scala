package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-mode execution check — the multi-JVM credibility gate.
  *
  * The reference's defining property is CORRECT MULTI-PROCESS execution
  * (its suite runs 2–4 worker processes); this engine had proven that
  * for MRJob (ClusterChaosSpec) but had only ever run the 92-query
  * surface inside one shared-heap `local[32]` JVM — a mode that
  * under-exercises exactly the risky code class: custom
  * TypedImperativeAggregate serialize/merge paths (TopKAgg, MinHashAgg,
  * SimHashAgg), broadcast serialization, and network shuffle.
  *
  * This main runs EVERY SparkEntry query on the given master —
  * `local[32]` or `local-cluster[4,8,3072]` (4 separate executor JVMs,
  * real serialization + loopback shuffle) — and emits one JSON file
  * with an ORDER-INSENSITIVE canonical fingerprint per query:
  *
  *   - columns sorted by name (the driver-compare convention);
  *   - doubles/floats rendered `%.6f` after round(·,6) and −0.0
  *     normalization (absorbs float-sum merge-order noise, the same
  *     tolerance the DuckDB oracle compare uses — everything else must
  *     be bit-identical);
  *   - binary as base64, arrays/maps/structs as JSON, rest as string;
  *   - per-row xxhash64 over the U+0001-joined rendering (nulls as a U+0000NULL sentinel), combined
  *     by count + modular sum + bit_xor — commutative, so the
  *     fingerprint is independent of row order, partitioning, AND mode.
  *
  * scripts/cluster_check.sh runs both modes and merges the two files
  * into CLUSTER_r{N}.json; a query whose fingerprint differs across
  * modes is a serialize/merge defect by construction (same code, same
  * data, only the execution substrate changed).
  */
object CrossCheck {

  /** (rows, modular fp sum, fp xor) — commutative canonical fingerprint. */
  private def fingerprint(df: DataFrame): (Long, Long, Long) = {
    val rendered = df.schema.fields.sortBy(_.name).map { f =>
      val c = df.col(f.name)
      val r = f.dataType match {
        case DoubleType | FloatType =>
          // +0.0 normalizes -0.0; round first so a mode-dependent last
          // ulp of a parallel double sum cannot flip the rendering.
          format_string("%.6f", round(c.cast("double"), 6) + lit(0.0))
        case BinaryType => base64(c)
        case _: ArrayType | _: MapType | _: StructType => to_json(c)
        case _ => c.cast("string")
      }
      coalesce(r, lit("\u0000NULL"))
    }
    val fp = df.select(xxhash64(concat_ws("\u0001", rendered.toSeq: _*)).as("fp"))
    // Modular sum, not raw sum: ANSI mode makes a wrapped long sum of
    // 92 queries' worth of raw 64-bit hashes an overflow ERROR.
    val row = fp.agg(
      count(lit(1)).as("n"),
      coalesce(sum(pmod(col("fp"), lit(1000000007L))), lit(0L)).as("s"),
      coalesce(expr("bit_xor(fp)"), lit(0L)).as("x")).head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val Array(master, sfDir, outPath) = args
    val isCluster = master.startsWith("local-cluster")
    // Executor JVMs launch from SPARK_HOME/jars only; graft's compiled
    // classes ride along explicitly (the ClusterChaosMain pattern).
    val extra =
      if (isCluster) Map("spark.executor.extraClassPath" -> sys.props("java.class.path"))
      else Map.empty[String, String]
    val spark = GraftSession("graft-crosscheck", master, 32, extra)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val entries = names.map { name =>
      def lap(): (Double, Either[String, (Long, Long, Long)]) = {
        val t0 = System.nanoTime()
        val out =
          try Right(fingerprint(SparkEntry.queries(name)(spark, sfDir)))
          catch { case e: Throwable =>
            System.err.println(s"[crosscheck] $name failed: ${e.getMessage}")
            // JSON-safe by construction: printable ASCII only, minus the
            // two JSON-string metacharacters — no escape sequence can be
            // formed, so the artifact always parses (ADVICE r7 #3).
            Left(Option(e.getMessage).getOrElse(e.getClass.getName)
              .map(c => if (c >= ' ' && c <= '~' && c != '"' && c != '\\') c else ' ')
              .take(200))
          }
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val (sec1, out1) = lap() // cold-ish: JIT + codegen + (cluster) executor warm
      var (sec2, out2) = lap() // warm lap — the comparable number
      // In-harness host-steal detection (verdict r10 #2): a warm lap
      // slower than its own cold lap — which paid JIT, codegen, and (in
      // cluster mode) executor launch — is physically impossible without
      // external interference (CLUSTER_r10 read ta_entropy warm 4.0 s vs
      // cold 0.67 s on byte-identical code). Re-lap up to 3 times and
      // keep the FASTEST warm lap; `relaps` in the artifact records how
      // often the detector fired, so a noisy capture is self-diagnosing.
      var relaps = 0
      var agree = (out1, out2) match {
        case (Right(a), Right(b)) => a == b
        case _ => false
      }
      while (sec2 > sec1 * 1.1 + 0.05 && relaps < 3 && out2.isRight) {
        val (s, o) = lap()
        // A FAILED re-lap must neither clobber the successful warm result
        // (a transient executor loss would otherwise turn two agreeing
        // laps into an artifact error and fail the gate it exists to
        // protect) nor falsify lapsAgree — only successful laps compare.
        if (o.isRight) {
          agree &&= ((out2, o) match {
            case (Right(a), Right(b)) => a == b
            case _ => false
          })
          if (s < sec2) { sec2 = s; out2 = o }
        }
        relaps += 1
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val body = out2 match {
        case Right((n, s, x)) =>
          s""""rows":$n,"fpsum":$s,"fpxor":$x,"err":null"""
        case Left(msg) =>
          s""""rows":-1,"fpsum":0,"fpxor":0,"err":"$msg""""
      }
      println(f"[crosscheck] $name%-24s ${sec2}%6.2f s  relaps=$relaps  $body")
      name -> (s"""{"secCold":$sec1,"sec":$sec2,"relaps":$relaps,"lapsAgree":$agree,$body}""")
    }
    val qs = entries.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line = s"""{"mode":"$master","sf":"$sfDir","queries":$qs}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), (line + "\n").getBytes("UTF-8"))
    println(s"[crosscheck] wrote $outPath")
    spark.stop()
  }
}
