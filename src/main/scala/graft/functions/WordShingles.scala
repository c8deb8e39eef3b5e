package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** word_shingles(text, n): whitespace-tokenize and emit all n-word
  * shingles joined by single spaces — one compiled pass per row.
  *
  * Replaces `split + transform(sequence(...), lambda) + concat_ws`: the
  * lambda pipeline evaluates interpreted per shingle and dominated the
  * dedup queries (the shingle subtree is recomputed per consumer branch).
  * Construction is byte-for-byte identical to the HOF form (leading empty
  * token from leading whitespace included, single-space join), so the
  * DuckDB oracles are unchanged.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (string, n>=1), got ${child.dataType} / $n")

  override def nullSafeEval(s: Any): Any =
    WordShingles.make(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.make($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** char_shingles(text, n): all n-character substrings — the char-level
  * sibling of word_shingles, one compiled pass per row (the
  * transform(sequence...) lambda it replaces measured ~4× slower on the
  * trigram profile at sf0.1).
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects (string, n>=1), got ${child.dataType} / $n")

  override def nullSafeEval(s: Any): Any =
    CharShingles.make(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharShingles.make($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {
  /** Static entry shared by eval and generated code. Substring semantics
    * match SQL `substring(text, i, n)` over character (not byte) offsets.
    */
  def make(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](s.length - n + 1)
    var i = 0
    while (i <= s.length - n) {
      out(i) = UTF8String.fromString(s.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(out)
  }

  def charShingles(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), n))
}

object WordShingles {
  /** Static entry shared by eval and generated code. */
  def make(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split("\\s+")
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
