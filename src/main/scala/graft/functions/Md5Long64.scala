package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5_long64(str): the low 64 bits of md5(str) as a LONG — the one hash
  * primitive in this engine that BOTH execution engines of the test
  * harness share. Spark and DuckDB have no common 64-bit string hash
  * (xxhash64 is Spark-only, DuckDB's `hash` is engine-internal), which is
  * what kept the winnow/simhash families on rows-only driver checks
  * through round 5. md5 is the overlap: DuckDB's `md5_number_lower(s)`
  * returns digest bytes 8..15 as a little-endian UBIGINT, and this
  * expression produces the same 64-bit pattern as a signed long, so any
  * query built on it can be restated value-for-value in oracle SQL.
  *
  * Bit-pattern equality (not numeric equality) is the contract: DuckDB's
  * UBIGINT is unsigned, so consumers that ORDER by the hash (winnowing's
  * window minima) must mask to 63 bits first — `& Long.MaxValue` here,
  * `& 9223372036854775807` there — after which signed and unsigned
  * ordering agree. Consumers that only test bits (SimHash's per-bit
  * votes) use the full 64 bits unmasked.
  *
  * ~10× the per-byte cost of xxhash64, which is the right trade here: the
  * tokens/grams hashed are tens of bytes (one MD5 compression round), the
  * hash runs inside the scan stage, and it buys a value-level DuckDB gate
  * for three formerly rows-only queries. dd_substring already pays the
  * same md5 cost per window for the same reason.
  */
case class Md5Long64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_long64 expects string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    Md5Long64.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Long64.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long64 {

  /** One digest + output buffer per thread: a MessageDigest allocation per
    * row would dominate the hash itself on short tokens.
    */
  private val local = new ThreadLocal[(MessageDigest, Array[Byte])] {
    override def initialValue(): (MessageDigest, Array[Byte]) =
      (MessageDigest.getInstance("MD5"), new Array[Byte](16))
  }

  /** The thread's (digest, 16-byte scratch) pair — for callers that hash
    * many grams per row (WinnowFingerprints) and want the lookup hoisted
    * out of their inner loop.
    */
  def threadLocalDigest(): (MessageDigest, Array[Byte]) = local.get()

  /** digest bytes 8..15, little-endian — exactly DuckDB md5_number_lower's
    * view of the digest, reinterpreted as a signed long.
    */
  def low64(dig: Array[Byte]): Long = {
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (dig(i) & 0xffL); i -= 1 }
    h
  }

  /** Static entry shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val (md, dig) = local.get()
    val b = s.getBytes
    md.update(b, 0, b.length)
    md.digest(dig, 0, 16)
    low64(dig)
  }

  def md5Long64(c: Column): Column =
    ColumnBridge.column(Md5Long64(ColumnBridge.expression(c)))
}
