package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** WinnowFingerprints carries dd_winnow's and ta_winnow's entire fingerprint
  * pass — both its interpreted eval and its codegen path must equal an
  * independent plain-Scala winnowing reference on arbitrary strings,
  * including the truncated-tail windows and the length-&lt;k empty case.
  */
class WinnowFingerprintsSpec extends SparkSuite {

  private val K = 8
  private val W = 4

  // Independent restatement of the gram hash (Md5Long64's contract,
  // sign-masked): digest bytes 8..15 little-endian, derived here by HEX
  // STRING reversal + parseUnsignedLong rather than the main code's byte
  // shifts, so an assembly bug can't hide in both.
  private def xx(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val le = hex.substring(16).grouped(2).toSeq.reverse.mkString
    java.lang.Long.parseUnsignedLong(le, 16) & Long.MaxValue
  }

  private def referenceFps(text: String): Set[Long] =
    if (text.length < K) Set.empty
    else {
      val hs = (0 to text.length - K).map(i => xx(text.substring(i, i + K)))
      hs.indices.map(i => hs.slice(i, math.min(i + W, hs.length)).min).toSet
    }

  test("codegen and interpreted fingerprints equal the plain-Scala reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // Mixed ASCII and 2-byte BMP chars: the é/ü/ß force make()'s
    // code-point byte-offset table (bytes.length != numChars), which the
    // all-ASCII fast path would otherwise leave untested. BMP-only keeps
    // the reference's UTF-16 char offsets ≡ code-point offsets, so the
    // plain-Scala substring reference stays valid.
    val alpha = "ab cdéf ghüß"
    // Lengths straddle k (empty case), k..k+w (truncated windows), and long.
    val texts = (0 until 150).map { i =>
      val len = Seq(0, 3, K - 1, K, K + 1, K + W - 1, K + W, 40, 200)(i % 9) + i / 9
      (i.toLong, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val df = texts.toDF("id", "text")
    def collect(codegen: Boolean): Map[Long, Set[Long]] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try df.select(col("id"),
          WinnowFingerprints.winnowFingerprints(col("text"), K, W).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val want = texts.map { case (id, t) => id -> referenceFps(t) }.toMap
    assert(collect(codegen = true) == want, "codegen path diverges from reference")
    assert(collect(codegen = false) == want, "interpreted path diverges from reference")
  }

  test("output arrays are sorted and duplicate-free") {
    import spark.implicits._
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog " * 20))
    val got = texts.toDF("id", "text")
      .select(WinnowFingerprints.winnowFingerprints(col("text"), K, W).as("fps"))
      .collect().head.getSeq[Long](0)
    assert(got == got.sorted, "fingerprints not sorted")
    assert(got.size == got.toSet.size, "fingerprints contain duplicates")
    assert(got.nonEmpty)
  }
}
