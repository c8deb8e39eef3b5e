package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** hash_vec(id, dim): a deterministic pseudo-random float vector derived
  * from an id — component j is the sign-masked md5 low-64 of "id:j"
  * mapped to a uniform float in [-1, 1):
  *
  *   x_j = float32( (md5_low64("id:j") & Long.MaxValue) % 2000001
  *                  / 1e6 − 1 )
  *
  * This exists for dd_embed_hi768: the driver corpus ships 64-d
  * embeddings — adversarially LOW-dimensional for sign-LSH (random-pair
  * cosine σ = 1/8 keeps the collision-rate tail heavy, SCALE_r11) — so
  * the production-dimension scale evidence needs a corpus at real
  * embedding width, derived from public inputs both engines can
  * recompute. md5 is the shared cross-engine hash (the Md5Long64
  * contract): DuckDB restates every component as
  * md5_number_lower(id || ':' || j) with the same mask/mod/divide, the
  * integer part is exact (< 2²¹), and the divide-by-1e6 / subtract /
  * float32 cast are identical IEEE double ops — so the generated corpus
  * is bit-equal across engines and the all-pairs oracle stays strict.
  *
  * Cost shape: dim MD5 compressions per row in one codegen'd loop with
  * the thread-local digest — linear in corpus rows, embarrassingly
  * parallel. At scale this construction is test scaffolding anyway: a
  * real corpus STORES its embeddings, which is why the hi768 entry
  * prefers a staged parquet of this exact output when one exists.
  */
case class HashVec(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1 && dim <= 65536, s"hash_vec dim $dim out of range")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hash_vec expects bigint id, got ${child.dataType}")

  override def nullSafeEval(id: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(HashVec.make(id.asInstanceOf[Long], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.HashVec.make($c, $dim));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashVec {

  /** Static entry shared by interpreted eval and generated code — one
    * operation sequence, bit-identical across modes.
    */
  def make(id: Long, dim: Int): Array[Float] = {
    val (md, dig) = Md5Long64.threadLocalDigest()
    val out = new Array[Float](dim)
    val prefix = (id.toString + ":").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var j = 0
    while (j < dim) {
      md.update(prefix, 0, prefix.length)
      val js = j.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      md.update(js, 0, js.length)
      md.digest(dig, 0, 16)
      val h = Md5Long64.low64(dig) & Long.MaxValue
      out(j) = ((h % 2000001L).toDouble / 1000000.0 - 1.0).toFloat
      j += 1
    }
    out
  }

  def hashVec(id: Column, dim: Int): Column =
    ColumnBridge.column(HashVec(ColumnBridge.expression(id), dim))
}
