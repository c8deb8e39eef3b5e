package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** char_entropy(text): Shannon entropy (bits) of the codepoint
  * distribution, computed INSIDE the row — the cheap randomness signal a
  * corpus quality filter uses to drop base64 blobs / minified noise
  * (entropy near log2 |alphabet|) and single-char padding junk (entropy
  * near 0). An explode-chars → groupBy formulation computes the same value
  * by shuffling one row per CHARACTER — corpus bytes × ~1 through the
  * wire; this expression keeps the scan's output at one double per doc
  * (the same argument as WinnowFingerprints, one operator earlier in the
  * pipeline).
  *
  * Codepoint counts accumulate in sorted order (ascending codepoint) so
  * the double summation is deterministic across partitions and runs; the
  * -Σ p·log₂(p) sum agrees with an unordered engine (the DuckDB oracle
  * groups then sums) to ~1 ulp, absorbed by the caller's round(…, 4).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    CharEntropy.of(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.of($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  private val Ln2 = math.log(2.0)

  /** Static entry shared by interpreted eval and generated code.
    *
    * ASCII fast path: a 128-slot count array (every corpus this engine
    * profiles is overwhelmingly ASCII); anything above spills to a sorted
    * two-array scheme via one sort of the raw codepoints. Both paths
    * iterate counts in ascending-codepoint order.
    */
  def of(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val ascii = new Array[Long](128)
    var spillCount = 0
    var spill: Array[Int] = null
    var i = 0
    val len = s.length
    var n = 0L
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (spill == null) spill = new Array[Int](len)
        spill(spillCount) = cp
        spillCount += 1
      }
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    val nd = n.toDouble
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) {
        val p = ascii(c) / nd
        h -= p * (math.log(p) / Ln2)
      }
      c += 1
    }
    if (spill != null) {
      java.util.Arrays.sort(spill, 0, spillCount)
      var j = 0
      while (j < spillCount) {
        var k = j
        while (k < spillCount && spill(k) == spill(j)) k += 1
        val p = (k - j) / nd
        h -= p * (math.log(p) / Ln2)
        j = k
      }
    }
    h
  }

  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))
}
