package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharEntropy, DotProduct, L2Norm, Md5Long64, TopKAgg, WordShingles}

/** SparkSessionExtensions hook: registers graft's native expressions as
  * SQL functions at session build (`.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`), so pure-SQL users get
  * them without any Scala call. This is the standard extension-injection
  * point — the same mechanism a custom Rule[LogicalPlan] or Strategy would
  * use if a later operator needs one (none does yet: SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("vec_l2norm"),
      info("vec_l2norm", "vec_l2norm(a) - L2 norm of a float/double array"),
      (exprs: Seq[Expression]) => L2Norm(exprs.head)))
    e.injectFunction((FunctionIdentifier("vec_topk"),
      info("vec_topk", "vec_topk(id, score, k) - top-k distinct ids by (score desc, id asc), as array<struct<id,score>>"),
      (exprs: Seq[Expression]) => TopKAgg(exprs(0), exprs(1),
        exprs(2).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"vec_topk k must be an integer literal, got $other")
        }).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("md5_long64"),
      info("md5_long64", "md5_long64(s) - low 64 bits of md5(s) as a long (DuckDB md5_number_lower's bit pattern)"),
      (exprs: Seq[Expression]) => Md5Long64(exprs.head)))
    e.injectFunction((FunctionIdentifier("char_entropy"),
      info("char_entropy", "char_entropy(text) - Shannon entropy (bits) of the codepoint distribution"),
      (exprs: Seq[Expression]) => CharEntropy(exprs.head)))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - n-word shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        })))
  }
}
