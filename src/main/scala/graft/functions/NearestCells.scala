package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** nearest_cells(v): the `r` nearest IVF cells of a vector — argmax-r of
  * v · c over a UNIT-normalized centroid matrix that lives in the codegen
  * `references` array — as one array<long> of cell ids, ordered
  * (dot desc, id asc).
  *
  * This replaces the round-8 join-then-aggregate assignment
  * (`e.join(broadcast(cents))` → N·k materialized candidate rows →
  * `groupBy(vec_id)` + TopKAgg → an N-row shuffle) with a pure per-row
  * projection: the N·k dot products still happen (they are the work), but
  * no N·k rows are ever materialized, no shuffle moves the corpus, and the
  * centroid broadcast-build jobs disappear — the matrix rides the plan the
  * same way [[HyperplaneSigs]]' plane matrix does, so the generated source
  * is identical across plans and compiles once per JVM. On local-cluster
  * this removed most of ann_ivf's per-job overhead (11 jobs → see
  * JobCountProbe), which is what the r8 cross-mode gate flagged (2.10×).
  *
  * Ranking is by raw dot against unit centroids: cosine(v, c) =
  * (v·ĉ)/|v| and |v| is constant per row, so the argmax-r set and its
  * (score desc, id asc) order match the cosine formulation exactly up to
  * float rounding of exact ties.
  *
  * Layout: `cents` row-major [k][dim], pre-normalized to unit L2 on the
  * driver; `ids(c)` is the cell id emitted for centroid c. Determinism:
  * a fixed-order double accumulation per (row, centroid) and an insertion
  * top-r with the (dot desc, id asc) comparator — interpreted and codegen
  * paths run the identical operation sequence, so results are bit-equal
  * across modes, executor counts, and thread schedules (the cross-mode
  * fingerprint gate depends on this).
  */
case class NearestCells(child: Expression, cents: Array[Double],
    ids: Array[Long], k: Int, dim: Int, r: Int)
  extends UnaryExpression {

  require(cents.length == k * dim, s"centroid matrix ${cents.length} != $k*$dim")
  require(ids.length == k, s"ids ${ids.length} != $k")
  require(r >= 1, s"r=$r must be >= 1")

  private val rEff = math.min(r, k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (VectorCodegen.isVector(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float|double> input, got ${child.dataType}")

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(dim, v.numElements())
    val bestD = Array.fill(rEff)(Double.NegativeInfinity)
    val bestI = new Array[Long](rEff)
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < n) {
        val vi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        d += cents(off + i) * vi
        i += 1
      }
      val id = ids(c)
      // insertion into the (dot desc, id asc)-sorted top-r
      if (d > bestD(rEff - 1) || (d == bestD(rEff - 1) && id < bestI(rEff - 1))) {
        var j = rEff - 1
        while (j > 0 && (d > bestD(j - 1) || (d == bestD(j - 1) && id < bestI(j - 1)))) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d; bestI(j) = id
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cm = ctx.addReferenceObj("cells", cents, "double[]")
      val im = ctx.addReferenceObj("cellIds", ids, "long[]")
      val bd = ctx.freshName("bestD")
      val bi = ctx.freshName("bestI")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val id = ctx.freshName("id")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |double[] $bd = new double[$rEff];
         |long[] $bi = new long[$rEff];
         |java.util.Arrays.fill($bd, Double.NEGATIVE_INFINITY);
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += $cm[$off + $i] * ${VectorCodegen.elemGet(child.dataType, a, i)};
         |  }
         |  long $id = $im[$c];
         |  if ($d > $bd[${rEff - 1}] || ($d == $bd[${rEff - 1}] && $id < $bi[${rEff - 1}])) {
         |    int $j = ${rEff - 1};
         |    while ($j > 0 && ($d > $bd[$j - 1] || ($d == $bd[$j - 1] && $id < $bi[$j - 1]))) {
         |      $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
         |    }
         |    $bd[$j] = $d; $bi[$j] = $id;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($bi);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCells {
  /** Column form: array<long> of the `r` nearest cell ids. `cents`
    * row-major [k][dim], unit-normalized.
    */
  def nearestCells(v: Column, cents: Array[Double], ids: Array[Long],
                   k: Int, dim: Int, r: Int): Column =
    ExpressionUtils.column(
      NearestCells(ExpressionUtils.expression(v), cents, ids, k, dim, r))
}
