package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Product-quantization codec for the vector scan path (ann_ivf_pq).
  *
  * The 100 TB problem these expressions exist for: an IVF posting list
  * that carries the raw vectors weighs `N · dim · 4` bytes — 100 TB of
  * float32 embeddings stays 100 TB no matter how it is partitioned, so
  * every query's cell scan re-reads fat rows and nothing hot fits in
  * executor memory. PQ stores each DIRECTION-normalized vector as `m`
  * one-byte codebook indices (m = 8 here: 8 bytes instead of 256 — a
  * 32× scan-side compression), and queries rank candidates by the
  * asymmetric distance — the dot product between the RAW query and the
  * code's reconstruction Σ_s book[s][code_s] — so the corpus side of
  * the scan never touches a raw vector. Only a bounded re-rank
  * shortlist (|Q| · calibrated-depth rows, hard-capped) reads the
  * original embeddings.
  * This is the inverted-file + asymmetric-distance design of Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
  * (TPAMI 2011) — the standard billion-scale layout.
  *
  * Both expressions keep the engine's determinism contract: the matrix
  * rides the generated code's `references` array (compiled once per
  * JVM, like [[NearestCells]]), all accumulation is fixed-index-order
  * double arithmetic, ties break toward the LOWER code index, and the
  * interpreted and codegen paths run the identical operation sequence —
  * so codes and ADC scores are bit-equal across modes, executor counts,
  * and thread schedules (the cross-mode fingerprint gate relies on it).
  */
private[graft] object PqCodegen {
  /** Shared validity check: books laid out row-major [m][ksub][subDim]. */
  def checkBooks(books: Array[Double], m: Int, ksub: Int, subDim: Int): Unit = {
    require(m >= 1 && ksub >= 2 && ksub <= 256 && subDim >= 1,
      s"pq shape m=$m ksub=$ksub subDim=$subDim out of range (ksub must fit a byte)")
    require(books.length == m * ksub * subDim,
      s"codebook length ${books.length} != $m*$ksub*$subDim")
  }
}

/** pq_encode(v): the m-byte PQ code of a vector — per subspace, the
  * index of the L2-nearest codebook entry to the UNIT-normalized
  * input's subvector (direction-only quantization: the corpus side of a
  * cosine search carries no magnitude, so the codebook spends all its
  * bits on the sphere). Zero vectors encode their raw (all-zero)
  * subvectors — deterministic, and irrelevant to cosine ranking.
  */
case class PqEncode(child: Expression, books: Array[Double],
    m: Int, ksub: Int, subDim: Int) extends UnaryExpression {

  PqCodegen.checkBooks(books, m, ksub, subDim)

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (VectorCodegen.isVector(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double> input, got ${child.dataType}")

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val dim = m * subDim
    val n = math.min(dim, v.numElements())
    // unit-normalize into a scratch buffer (fixed index order)
    val u = new Array[Double](dim)
    var s2 = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      u(i) = x; s2 += x * x; i += 1
    }
    val inv = if (s2 == 0.0) 1.0 else 1.0 / math.sqrt(s2)
    i = 0
    while (i < n) { u(i) *= inv; i += 1 }
    val code = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var bestJ = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ksub) {
        val off = (s * ksub + j) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = u(s * subDim + t) - books(off + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; bestJ = j } // strict <: ties keep lower j
        j += 1
      }
      code(s) = bestJ.toByte
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(code)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bm = ctx.addReferenceObj("pqBooks", books, "double[]")
      val dim = m * subDim
      val u = ctx.freshName("u")
      val s2 = ctx.freshName("s2")
      val inv = ctx.freshName("inv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val code = ctx.freshName("code")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestJ = ctx.freshName("bestJ")
      val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |double[] $u = new double[$dim];
         |double $s2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = ${VectorCodegen.elemGet(child.dataType, a, i)};
         |  $u[$i] = x; $s2 += x * x;
         |}
         |double $inv = ($s2 == 0.0) ? 1.0 : 1.0 / java.lang.Math.sqrt($s2);
         |for (int $i = 0; $i < $n; $i++) { $u[$i] *= $inv; }
         |byte[] $code = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $bestJ = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    int $off = ($s * $ksub + $j) * $subDim;
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $subDim; $t++) {
         |      double $diff = $u[$s * $subDim + $t] - $bm[$off + $t];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
         |  }
         |  $code[$s] = (byte) $bestJ;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($code);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_adc_dot(code, q): the asymmetric dot product — RAW query against
  * the code's reconstruction, Σ_s q_sub(s) · book[s][code_s]. Used only
  * to RANK candidates per query (the shortlist is exact-re-ranked
  * before output), and a per-query positive scale cannot change a
  * ranking, so the query is not normalized here — one fewer pass.
  */
case class PqAdcDot(left: Expression, right: Expression,
    books: Array[Double], m: Int, ksub: Int, subDim: Int)
  extends BinaryExpression {

  PqCodegen.checkBooks(books, m, ksub, subDim)

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    left.dataType match {
      case ArrayType(ByteType, _) if VectorCodegen.isVector(right.dataType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot expects (array<byte>, array<float|double>), got " +
          s"${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val isFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val mEff = math.min(m, code.numElements())
    var acc = 0.0
    var s = 0
    while (s < mEff) {
      // Shape guard (ADVICE r11): when ksub < 256, a code byte produced by
      // a DIFFERENT codebook shape would silently read the next subspace's
      // entries — and in the last subspace index past the books array. A
      // mismatched codebook is a caller bug; fail loud, mirroring
      // checkBooks.
      val cj = code.getByte(s) & 0xFF
      if (cj >= ksub) throw new IllegalArgumentException(
        s"pq_adc_dot: code byte $cj >= ksub $ksub - code was produced by a " +
          "different codebook shape")
      val off = (s * ksub + cj) * subDim
      var t = 0
      while (t < subDim) {
        val qi = s * subDim + t
        if (qi < q.numElements()) {
          val x = if (isFloat) q.getFloat(qi).toDouble else q.getDouble(qi)
          acc += x * books(off + t)
        }
        t += 1
      }
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val bm = ctx.addReferenceObj("pqBooks", books, "double[]")
      val acc = ctx.freshName("acc")
      val mEff = ctx.freshName("mEff")
      val qn = ctx.freshName("qn")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val qi = ctx.freshName("qi")
      val cj = ctx.freshName("cj")
      s"""
         |int $mEff = java.lang.Math.min($m, $a.numElements());
         |int $qn = $b.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $mEff; $s++) {
         |  int $cj = ((int) $a.getByte($s)) & 0xFF;
         |  if ($cj >= $ksub) throw new IllegalArgumentException(
         |    "pq_adc_dot: code byte " + $cj + " >= ksub " + $ksub +
         |    " - code was produced by a different codebook shape");
         |  int $off = ($s * $ksub + $cj) * $subDim;
         |  for (int $t = 0; $t < $subDim; $t++) {
         |    int $qi = $s * $subDim + $t;
         |    if ($qi < $qn) {
         |      $acc += ${VectorCodegen.elemGet(right.dataType, b, qi)} * $bm[$off + $t];
         |    }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqCodes {
  /** Column form: m-byte PQ code of a vector (direction-quantized). */
  def pqEncode(v: Column, books: Array[Double], m: Int, ksub: Int,
               subDim: Int): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(v), books, m, ksub, subDim))

  /** Column form: asymmetric dot of a raw query against a PQ code. */
  def pqAdcDot(code: Column, q: Column, books: Array[Double], m: Int,
               ksub: Int, subDim: Int): Column =
    ExpressionUtils.column(
      PqAdcDot(ExpressionUtils.expression(code), ExpressionUtils.expression(q),
        books, m, ksub, subDim))
}
