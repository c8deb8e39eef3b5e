package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class CharEntropySpec extends SparkSuite {

  /** Independent plain-Scala reference: histogram via groupBy, entropy
    * summed over ascending codepoints — shares NO code with the
    * expression's count-array/spill implementation.
    */
  private def reference(s: String): Double = {
    if (s.isEmpty) return 0.0
    val cps = s.codePoints().toArray
    val n = cps.length.toDouble
    cps.toSeq.groupBy(identity).toSeq.sortBy(_._1).map { case (_, g) =>
      val p = g.size / n
      -p * (math.log(p) / math.log(2.0))
    }.sum
  }

  test("entropy of known distributions") {
    assert(CharEntropy.of(UTF8String.fromString("")) == 0.0)
    assert(CharEntropy.of(UTF8String.fromString("aaaa")) == 0.0)
    assert(math.abs(CharEntropy.of(UTF8String.fromString("abab")) - 1.0) < 1e-12)
    // 4 equiprobable symbols -> exactly 2 bits
    assert(math.abs(CharEntropy.of(UTF8String.fromString("abcd")) - 2.0) < 1e-12)
  }

  test("interpreted eval equals the independent reference on random strings") {
    val gen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'ü', 'λ', '語')).map(_.mkString))
    (0 until 200).foreach { i =>
      val s = gen(Gen.Parameters.default, Seed(13L + i)).getOrElse("")
      val got = CharEntropy.of(UTF8String.fromString(s))
      val want = reference(s)
      assert(math.abs(got - want) < 1e-9, s"'$s': $got vs $want")
    }
  }

  test("codegen path equals interpreted eval through a real plan") {
    import spark.implicits._
    val strings = Seq("", "aaaa", "abab", "the quick brown fox",
      "aAbBçç  \t!!", "ααββγγ mixed ascii λλ")
    val df = strings.toDF("s")
      .select(col("s"), CharEntropy.charEntropy(col("s")).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    strings.foreach { s =>
      assert(math.abs(got(s) - reference(s)) < 1e-9,
        s"codegen diverged on '$s'")
    }
  }

  test("SQL registration: char_entropy callable from SQL") {
    // The shared test session is built without extensions — register via
    // the same FunctionRegistry path GraftExtensions uses, then call SQL.
    import spark.implicits._
    Seq("abcd").toDF("s").createOrReplaceTempView("ce_probe")
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("char_entropy_t"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", null, "char_entropy_t", "char_entropy_t(s)", "", "", "", "", "", "", "scala_udf"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharEntropy(exprs.head))
    val h = spark.sql("SELECT char_entropy_t(s) FROM ce_probe").collect().head.getDouble(0)
    assert(math.abs(h - 2.0) < 1e-12)
  }
}
