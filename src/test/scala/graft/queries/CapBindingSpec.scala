package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Drives the scale guards at a scale where they actually FIRE — the test
  * corpora never trip them (max shingle df at sf0.1 is 25 vs the cap of
  * 1000), so without this spec the capped code paths ship verified only in
  * their no-op regime.
  *
  * Synthetic corpus: 1050 background docs all sharing two planted hot
  * shingles (df = 1053 each with the planted docs > ShingleDfCap = 1000),
  * plus planted pairs
  * that qualify ONLY under the capped contract and ONLY under the
  * uncapped one — so the assertions can tell which contract executed.
  */
class CapBindingSpec extends SparkSuite {
  import spark.implicits._

  // (doc_id, shingle) rows. Background docs: the two hot shingles plus 8
  // unique shingles each — any two background docs share ONLY hot
  // shingles, so under the capped contract their Jaccard is 0. (Uncapped,
  // the 1050-doc hot keys alone would fan the self-join to ~1050² pairs —
  // the skew bomb the cap exists to defuse.)
  private lazy val sh = {
    val background = (0L until 1050L).flatMap { d =>
      Seq((d, "HOT_A"), (d, "HOT_B")) ++ (0 until 8).map(j => (d, s"u${d}_$j"))
    }
    // Capped-only pair (9000, 9001): shares r0..r4; 9000 also has both hot
    // shingles. Uncapped J = 5/(7+5-5) = 0.714 < 0.8 (one-sided hot
    // shingles drag it down); capped J = 5/5 = 1.0. The residue is sized
    // AT the degenerate-basis floor (5 — round 16) so the pair stays
    // COMPARABLE: this spec drives the cap binding; the floor's engaged
    // behavior is BasisFloorSpec's domain.
    val cappedOnly =
      (0 until 5).flatMap(j => Seq((9000L, s"r$j"), (9001L, s"r$j"))) ++
        Seq((9000L, "HOT_A"), (9000L, "HOT_B"))
    // Uncapped-only pair (9100, 9101): both have both hot shingles plus
    // s0,s1; 9101 adds t0. Uncapped J = 4/(4+5-4) = 0.8 ≥ 0.8 (shared hot
    // shingles inflate it); capped J = 2/(2+3-2) = 2/3 < 0.8.
    val uncappedOnly =
      Seq((9100L, "HOT_A"), (9100L, "HOT_B"), (9100L, "s0"), (9100L, "s1"),
        (9101L, "HOT_A"), (9101L, "HOT_B"), (9101L, "s0"), (9101L, "s1"),
        (9101L, "t0"))
    // A genuine near-dup pair untouched by the cap, as a recall control.
    val clean = (0 until 9).flatMap(j => Seq((9200L, s"c$j"), (9201L, s"c$j"))) ++
      Seq((9201L, "c_extra")) // J = 9/10 = 0.9
    (background ++ cappedOnly ++ uncappedOnly ++ clean)
      .toDF("doc_id", "shingle")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("df cap fires: hot shingles excluded from Jaccard on both sides") {
    val exact = pairSet(Dedup.jaccardPairs(sh, 0.8))
    // Capped-only pair present at its CAPPED similarity — proves the hot
    // shingles were excluded from sizes and intersection alike.
    assert(exact.contains((9000L, 9001L, 1.0)),
      s"capped-only pair missing or mis-scored: $exact")
    // Uncapped-only pair absent — proves shared hot shingles don't count.
    assert(!exact.exists(p => p._1 == 9100L && p._2 == 9101L),
      s"uncapped-only pair leaked through the cap: $exact")
    // Clean pair unaffected by the cap.
    assert(exact.contains((9200L, 9201L, 0.9)))
    // Background docs share only hot shingles → NO pairs among them (and
    // the join never saw the 1050²/2 hot-key fan-out).
    assert(!exact.exists(p => p._1 < 1050L && p._2 < 1050L),
      "background docs paired through a hot shingle — cap did not fire")
  }

  test("minhash ≡ exact capped Jaccard when the cap fires") {
    // The equivalence dd_minhash ships on must survive the cap binding:
    // signatures are computed over the capped shingle set, so banding
    // probability tracks the same capped Jaccard that verification scores
    // (a signature over UNCAPPED shingles would see J = 0.6 for the
    // capped-only pair and could drop it before verification).
    val exact = pairSet(Dedup.jaccardPairs(sh, 0.8))
    val mh = pairSet(Dedup.minhashFrom(sh))
    assert(mh == exact,
      s"minhash diverged from capped exact form:\n mh=$mh\n exact=$exact")
  }

  test("LSH bit width grows past the sf0.1 operating point and clamps") {
    import graft.functions.HyperplaneSigs.bitsFor
    val atSf01 = bitsFor(2000L, 16, 20) // the largest test corpus
    // A corpus two decades bigger needs strictly more bits (occupancy
    // would otherwise grow 100×)…
    assert(bitsFor(200000L, 16, 20) > atSf01)
    assert(bitsFor(200000L, 16, 20) == 14, "⌈log₂(200000/16)⌉ = 14")
    // …and the width saturates at maxBits instead of growing unbounded.
    assert(bitsFor(100_000_000_000L, 16, 20) == 20)
    assert(bitsFor(10L, 16, 20) == 4, "floor clamp")
  }
}
