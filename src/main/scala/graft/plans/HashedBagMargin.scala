package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hashing-trick linear-margin kernel: one pass over the text,
  * one md5 per whitespace token, margin += sign(token) · w[bucket
  * (token)] in exact int64 — the scoring loop of
  * [[graft.operators.FeatureEng.qualityClassifier]] fused into a
  * single expression.
  *
  * Why native: the operator's first spellings were (a) explode +
  * groupBy over every token — an O(total tokens) keyed exchange that
  * measured as the dominant cost of the curation throughput gauntlet
  * — and (b) a higher-order `aggregate(transform(split(...)))` fold,
  * which is row-local but evaluates its lambda (two md5s + hex
  * arithmetic per token) on the INTERPRETED expression path per
  * element. This kernel is zero-shuffle AND compiled: codegen emits
  * one static call per row; the token loop, a thread-local reused
  * MessageDigest, and the precomputed weight table live in plain JVM
  * code.
  *
  * Exact-parity contract with the Catalyst spelling (pinned in
  * FeatureEngSpec): tokenization matches `split(text, " ")`
  * — EVERY segment between ASCII spaces is a token, including empty
  * segments from leading/adjacent/trailing spaces (0x20 bytes never
  * occur inside multi-byte UTF-8 sequences, so byte scanning is
  * correct); bucket = md5 hex nibble₀·16 + nibble₁ mod `buckets` ≡
  * unsigned byte₀ mod `buckets`; sign = +1 iff hex nibble₂ ≥ 8 ≡
  * byte₁'s high bit; w[b] = (md5("qw:"+b) byte₀ unsigned mod 101) −
  * 50, precomputed driver-side by the same rule the SQL oracle
  * derives per row. Integer addition is order-free, so the per-token
  * fold equals the per-bucket grouping exactly.
  */
case class HashedBagMargin(child: Expression, buckets: Int,
                           weights: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && buckets >= 1 && buckets <= 256 &&
        weights.length == buckets)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashed_bag_margin expects (STRING, 1..256 buckets with a matching " +
        s"weight table), got ${child.dataType.simpleString} with " +
        s"buckets=$buckets, |weights|=${weights.length}")

  override protected def nullSafeEval(input: Any): Any =
    HashedBagMargin.compute(input.asInstanceOf[UTF8String], buckets, weights)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.HashedBagMargin.compute($s, $buckets, $wRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedBagMargin = copy(child = newChild)
}

object HashedBagMargin {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The compiled per-row kernel (called from both eval paths). */
  def compute(s: UTF8String, buckets: Int, weights: Array[Long]): Long = {
    val bytes = s.getBytes
    val md = md5.get()
    var margin = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val w = weights((d(0) & 0xFF) % buckets)
        margin += (if ((d(1) & 0x80) != 0) w else -w)
        start = i + 1
      }
      i += 1
    }
    margin
  }

  /** Deterministic per-bucket weight table: (md5("qw:"+b) byte₀
    * unsigned mod 101) − 50 — the same derivation the SQL oracle
    * spells per row with hex nibbles.
    */
  def weightsFor(buckets: Int): Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(buckets) { b =>
      md.reset()
      val d = md.digest(s"qw:$b".getBytes("UTF-8"))
      (((d(0) & 0xFF) % 101) - 50).toLong
    }
  }

  def apply(c: Column, buckets: Int): Column =
    ColumnBridge.column(
      HashedBagMargin(ColumnBridge.expression(c), buckets,
        weightsFor(buckets)))
}
