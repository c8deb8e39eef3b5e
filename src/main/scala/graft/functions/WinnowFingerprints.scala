package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** winnow_fingerprints(text, k, w): the full winnowing pass (Schleimer et
  * al.'s MOSS scheme — hash every k-char gram, keep each w-position
  * forward window's minimum, return the distinct minima, sorted) computed
  * INSIDE the row.
  *
  * Replaces `posexplode(char_shingles) → hash → Window(partitionBy
  * doc_id, rowsBetween(0, w-1)) → distinct`: that pipeline shuffled one
  * (doc_id, pos, hash) row per character position across the cluster just
  * to compute a value that is a pure per-row function of `text` — at 100 TB
  * that is ~20× the corpus bytes through the shuffle for zero information
  * gain. Here the scan emits the finished fingerprint set and the only
  * shuffle left in the winnow queries is the one that carries signal (the
  * fingerprint equality join / the final per-doc aggregate).
  *
  * The gram hash is the low 64 bits of md5 masked to 63 bits (see
  * Md5Long64 for the DuckDB contract): `md5_number_lower(substr(text, i,
  * k)) & Long.MaxValue` restates it exactly in oracle SQL, which is what
  * gives ta_winnow and dd_winnow value-level driver gates (xxhash64, the
  * round-5 hash, had no DuckDB equivalent). The mask matters because
  * winnowing ORDERS hashes (window minima): DuckDB compares UBIGINT
  * unsigned, the JVM compares long signed — clearing the sign bit makes
  * the two orders identical. Grams are k consecutive UTF-8 code points
  * (what DuckDB `substr` counts); the window at the tail truncates
  * (`min(h[i..min(i+w-1, L-1)])` for every start i), matching
  * `ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING` over a bounded partition.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects (string, k>=1, w>=1), got ${child.dataType} / $k / $w")

  override def nullSafeEval(s: Any): Any =
    WinnowFingerprints.make(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.make($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Static entry shared by interpreted eval and generated code.
    *
    * The inner window-min loop is brute force O(L·w): w is a small constant
    * (4 in every caller) so four in-register compares per position beat a
    * monotonic deque's branchy bookkeeping, and the hashing pass above it
    * dominates anyway. Dedup is sort + in-place unique — no boxing until
    * the final array, and the sorted output makes downstream results
    * order-stable for free.
    *
    * Grams are hashed as byte ranges of the row's UTF-8 buffer (one
    * `getBytes` per document, a code-point offset table only when the text
    * is non-ASCII) — the round-5 form allocated a String + UTF8String per
    * gram POSITION, O(L·k) transient garbage per document in the hottest
    * scan of the winnow family.
    */
  def make(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val nChars = text.numChars()
    val L = nChars - k + 1
    if (L <= 0) return new GenericArrayData(Array.empty[Any])
    // Byte offset of each code point. ASCII (the overwhelming corpus case)
    // is identity — skip the table and index the buffer directly.
    val offs: Array[Int] =
      if (bytes.length == nChars) null
      else {
        val o = new Array[Int](nChars + 1)
        var b = 0; var c = 0
        while (c < nChars) {
          o(c) = b
          b += UTF8String.numBytesForFirstByte(bytes(b))
          c += 1
        }
        o(nChars) = bytes.length
        o
      }
    val (md, dig) = Md5Long64.threadLocalDigest()
    val h = new Array[Long](L)
    var i = 0
    while (i < L) {
      val from = if (offs == null) i else offs(i)
      val until = if (offs == null) i + k else offs(i + k)
      md.update(bytes, from, until - from)
      md.digest(dig, 0, 16)
      // Masked to 63 bits so the signed window-min below agrees with the
      // oracle's unsigned UBIGINT min — see the class doc.
      h(i) = Md5Long64.low64(dig) & Long.MaxValue
      i += 1
    }
    val mins = new Array[Long](L)
    i = 0
    while (i < L) {
      var m = h(i)
      var j = i + 1
      val end = math.min(i + w, L)
      while (j < end) { if (h(j) < m) m = h(j); j += 1 }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var n = 1
    i = 1
    while (i < L) {
      if (mins(i) != mins(n - 1)) { mins(n) = mins(i); n += 1 }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
}

/** sorted_intersect_count(a, b): |a ∩ b| for two SORTED array&lt;long&gt;
  * columns — a branch-light merge scan, codegen'd. This is the verify step
  * of the prefix-filtered set-similarity join (dd_winnow): per candidate
  * pair one linear pass over the two fingerprint arrays, no explode, no
  * re-shuffle. `array_intersect` computes the same value but builds a hash
  * set per row interpreted; the merge costs |a|+|b| compares flat.
  *
  * Inputs MUST be sorted ascending and duplicate-free (WinnowFingerprints
  * emits exactly that); the count is then exact set intersection.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<long>, array<long>), got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedLongIntersect.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  /** Static entry shared by interpreted eval and generated code. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
