package graft.queries

import org.apache.spark.sql.functions._

/** Differential gate for the fuzzy hot-bucket coarsening (round 16,
  * VERDICT r15 #1): past CoarseMinMass raw join mass, members of hot
  * fine buckets are re-keyed at coarse 4-row bands — lossy by design for
  * the low-J candidate mass, and like the sketch cut its activated
  * regime never overlaps an oracle corpus. This main runs
  * dd_decontaminate_fuzzy twice at a staged scale point — once with
  * coarsening forced ON (threshold 0), once forced OFF (Long.MaxValue),
  * the shipped sketch-cut threshold in both laps — and requires
  * IDENTICAL output row sets, emitting one JSON line for the round
  * artifact (FUZZYCOARSE_r{N}.json via scripts/round_probes.sh).
  *
  *   sbt "Test/runMain graft.queries.FuzzyCoarseCheck /tmp/graft_scale/sf10 [out.json]"
  */
object FuzzyCoarseCheck {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/tmp/graft_scale/sf10"
    val outPath = if (args.length > 1) Some(args(1)) else None
    val spark = graft.GraftSession("fuzzy-coarse-check")

    // Measure the guard's own quantity through the query's stages
    // (capped basis → floored signatures → fine buckets → occupancy), so
    // the artifact records the mass the shipped threshold is read
    // against, plus the hot-bucket census that says how much of it the
    // coarse path re-keys.
    val sh = Dedup.cappedShingles(spark, sf).localCheckpoint()
    val sigs = Dedup.minhashSigs(sh)
      .filter(col("nsh") >= CorpusOps.MinCappedShingles)
      .select(col("doc_id"), col("sig"))
      .localCheckpoint()
    val occ = Dedup.bucketsFromSigs(sigs, CorpusOps.FuzzyBandRows)
      .select(col("band"), col("bh"),
        (col("doc_id") % CorpusOps.EvalModulus === 0).as("is_eval"))
      .groupBy(col("band"), col("bh"))
      .agg(count_if(col("is_eval")).as("ne"),
        count_if(!col("is_eval")).as("nt"))
      .localCheckpoint()
    val totals = occ.agg(coalesce(sum(col("ne") * col("nt")), lit(0L)),
      coalesce(sum(col("ne") + col("nt")), lit(0L))).head()
    val mass = totals.getLong(0)
    val nSigned = totals.getLong(1) / (Dedup.NumPerms.toLong / CorpusOps.FuzzyBandRows)
    // The shipped decision is ADAPTIVE (round 16): max of the absolute
    // floor and CoarsePairsPerDoc × signed docs.
    val adaptive = math.max(CorpusOps.CoarseMinMass,
      CorpusOps.CoarsePairsPerDoc * nSigned)
    val hotBuckets = occ.filter(col("ne") + col("nt") > CorpusOps.HotBucketOcc)
      .count()
    val hotMass = occ.filter(col("ne") + col("nt") > CorpusOps.HotBucketOcc)
      .agg(coalesce(sum(col("ne") * col("nt")), lit(0L))).head().getLong(0)

    def rows(coarseMinMass: Long): (Array[String], Double) = {
      val t0 = System.nanoTime()
      val r = CorpusOps.decontaminateFuzzyCoarse(spark, sf,
          CorpusOps.SketchCutMinMass, coarseMinMass)
        .collect().map(_.toString).sorted
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[fuzzycoarse] coarseMinMass=$coarseMinMass rows=${r.length} wall=$wall%.1fs")
      (r, wall)
    }
    // Lap protocol (round 16): the first lap of anything in a fresh JVM
    // carries 60+ s of JIT/page-cache warmup at this scale (SigProbe
    // measured 74.5 → 3.6 s on an UNCHANGED query), so the walls that
    // decide the threshold are min-of-2 over ALTERNATING warm laps after
    // one untimed warm-up; row equality is asserted on the first pair.
    rows(Long.MaxValue) // untimed warm-up
    val (on, onW1) = rows(0L)
    val (off, offW1) = rows(Long.MaxValue)
    val (_, onW2) = rows(0L)
    val (_, offW2) = rows(Long.MaxValue)
    val onWall = math.min(onW1, onW2)
    val offWall = math.min(offW1, offW2)
    val equal = on.sameElements(off)
    val line = f"""{"sf":"$sf","mass":$mass,"signedDocs":$nSigned,""" +
      f""""hotBuckets":$hotBuckets,"hotMass":$hotMass,""" +
      f""""adaptiveThreshold":$adaptive,""" +
      f""""shippedWouldEngage":${mass > adaptive},""" +
      f""""coarseOnRows":${on.length},"coarseOffRows":${off.length},""" +
      f""""coarseOnWall":$onWall%.1f,"coarseOffWall":$offWall%.1f,"equal":$equal}"""
    println("[fuzzycoarse] " + line)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), (line + "\n").getBytes("UTF-8")))
    require(equal, "hot-bucket coarsening changed the fuzzy-decontamination " +
      s"output in the activated regime:\n on-only=${on.diff(off).take(5).mkString("; ")}" +
      s"\n off-only=${off.diff(on).take(5).mkString("; ")}")
    spark.stop()
  }
}
