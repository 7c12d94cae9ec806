package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded Levenshtein kernel for the linkage hot paths.
  *
  * Contract: IDENTICAL results to Spark's `levenshtein(l, r, k)` —
  * the edit distance when it is ≤ k, −1 otherwise — pinned by a
  * property test against the built-in over random corpora
  * (EditDistanceSpec). The built-in is the semantic reference; this
  * kernel only changes the constant factor:
  *
  *  - common prefix/suffix trimming first (distance-preserving, the
  *    classic edit-distance identity). On near-duplicate entity names
  *    — the record-linkage regime, where most candidate pairs share
  *    long literal prefixes — this collapses the DP to a few cells.
  *  - ASCII fast path on raw bytes (byte == char for ASCII, so the
  *    banded byte DP equals the codepoint DP the built-in computes).
  *    Any non-ASCII input falls back to the built-in itself, so
  *    parity is by construction rather than by reimplementation.
  *  - k+1 saturation keeps the band values in small ints; two reused
  *    rows, no per-cell allocation.
  *
  * Measured on q_record_linkage's ~900k bounded comparisons at sf0.1
  * (local[4]): the built-in costs ~0.9 s of the query's 1.5 s; this
  * kernel removes most of that (see BENCH trend notes).
  */
object Lev {

  /** Edit distance of `a`/`b` if ≤ k, else −1 — exactly the built-in
    * `levenshtein(a, b, k)`. Non-ASCII input delegates to the
    * built-in's own UTF8String implementation.
    */
  def bounded(a: UTF8String, b: UTF8String, k: Int): Int = {
    if (k < 0) return a.levenshteinDistance(b, k)
    if (!a.isFullAscii || !b.isFullAscii) return a.levenshteinDistance(b, k)
    val an = a.numBytes
    val bn = b.numBytes
    val lim = math.min(an, bn)
    // distance-preserving trims: shared prefix, then shared suffix
    var pre = 0
    while (pre < lim && a.getByte(pre) == b.getByte(pre)) pre += 1
    var suf = 0
    while (suf < lim - pre &&
           a.getByte(an - 1 - suf) == b.getByte(bn - 1 - suf)) suf += 1
    // remaining windows: a[pre, pre+n), b[pre, pre+m) with n <= m
    var n = an - pre - suf
    var m = bn - pre - suf
    var s = a; var t = b
    if (n > m) { val tmp = n; n = m; m = tmp; s = b; t = a }
    if (m - n > k) return -1
    if (n == 0) return m // m - n <= k already established
    // clamp the threshold to the remaining distance ceiling: the
    // trimmed windows are at most m apart, so k beyond m buys
    // nothing — and an unclamped k near Int.MaxValue would wrap the
    // band arithmetic (inf = k+1, hi = j+k) negative. Semantics
    // unchanged: distance <= m <= original k whenever kk = m.
    val kk = math.min(k, m)
    // banded two-row DP over the short window, saturated at kk+1
    val inf = kk + 1
    var p = new Array[Int](n + 1)
    var d = new Array[Int](n + 1)
    val boundary = math.min(n, kk) + 1
    var idx = 0
    while (idx < boundary) { p(idx) = idx; idx += 1 }
    while (idx <= n) { p(idx) = inf; idx += 1 }
    var j = 1
    while (j <= m) {
      val tj = t.getByte(pre + j - 1)
      d(0) = if (j <= kk) j else inf
      // band bounds; lo <= hi always holds here (m - n <= kk implies
      // j - kk <= n for every j <= m), so no early exit is needed
      val lo = math.max(1, j - kk)
      val hi = math.min(n, j + kk)
      // seed BOTH band edges with inf: the next row's viaDel reads
      // p(i) one past this row's band on each side, and a stale slot
      // (0 from array init, or a value two rows old) must never leak
      // in as a real cost
      if (lo > 1) d(lo - 1) = inf
      if (hi < n) d(hi + 1) = inf
      var i = lo
      while (i <= hi) {
        val cost =
          if (s.getByte(pre + i - 1) == tj) p(i - 1)
          else {
            val viaIns = d(i - 1)
            val viaDel = p(i)
            val viaSub = p(i - 1)
            1 + math.min(math.min(viaIns, viaDel), viaSub)
          }
        d(i) = if (cost > inf) inf else cost
        i += 1
      }
      val swap = p; p = d; d = swap
      j += 1
    }
    if (p(n) <= k) p(n) else -1
  }
}

/** `bounded_levenshtein(l, r, k)` — drop-in for the built-in
  * three-argument `levenshtein`, dispatching to [[Lev.bounded]] from
  * both the codegen and interpreted paths.
  */
case class BoundedLevenshtein(left: Expression, right: Expression,
                              bound: Int) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_levenshtein expects 2 STRING arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Lev.bounded(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.Lev.bounded($l, $r, $bound);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {
  /** Column-API entry point, mirroring `levenshtein(l, r, lit(k))`. */
  def apply(l: Column, r: Column, bound: Int): Column =
    ColumnBridge.column(BoundedLevenshtein(
      ColumnBridge.expression(l), ColumnBridge.expression(r), bound))
}
