package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** banded_minhash(set, numPerms, bandRows): the whole LSH banding pass for
  * a per-row long-set column — numPerms seeded-xxhash64 minima, grouped
  * into numPerms/bandRows bands, each band folded to one 64-bit key —
  * computed INSIDE the row, returning `array<long>` of band keys.
  *
  * This is the array-input sibling of MinHashAgg (which aggregates
  * exploded (doc_id, element) rows): when the element set already lives in
  * one row — e.g. WinnowFingerprints' output — aggregating would mean
  * explode → shuffle → re-group just to compute a value that is a pure
  * function of the array. Here the scan emits finished band keys and the
  * only shuffle in an LSH join is the candidate bucket join itself.
  *
  * Permutation p is the seeded hash x ↦ xxhash64(x, seed = p+1) (XXH64's
  * long path — the same primitive Spark's xxhash64 column function uses);
  * band keys fold the band's minima through xxhash64 seeded by the band
  * index, so equal keys in different bands never alias a bucket (the
  * caller joins on (band, key) anyway; a cross-band value collision would
  * only add one exactly-verified candidate).
  */
case class BandedMinHash(child: Expression, numPerms: Int, bandRows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if numPerms >= 1 && bandRows >= 1 &&
        numPerms % bandRows == 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"banded_minhash expects (array<long>, perms % bandRows == 0), got $dt / $numPerms / $bandRows")
    }

  override def nullSafeEval(a: Any): Any =
    BandedMinHash.make(a.asInstanceOf[ArrayData], numPerms, bandRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandedMinHash.make($c, $numPerms, $bandRows);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandedMinHash {

  /** Static entry shared by interpreted eval and generated code. One pass
    * over the elements per permutation — numPerms × |set| XXH64.hashLong
    * calls, all in registers, no allocation beyond the two output-sized
    * arrays.
    */
  def make(set: ArrayData, numPerms: Int, bandRows: Int): ArrayData = {
    val n = set.numElements()
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = set.getLong(i)
      var p = 0
      while (p < numPerms) {
        val h = XXH64.hashLong(x, p + 1L)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    val nBands = numPerms / bandRows
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var acc = b.toLong
      var j = b * bandRows
      val end = j + bandRows
      while (j < end) { acc = XXH64.hashLong(mins(j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def bandedMinHash(set: Column, numPerms: Int, bandRows: Int): Column =
    ColumnBridge.column(BandedMinHash(ColumnBridge.expression(set), numPerms, bandRows))
}
