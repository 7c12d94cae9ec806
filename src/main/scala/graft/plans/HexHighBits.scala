package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash token kernel: bit j of the result = the high bit of
  * hex digit j of a lowercase hex string (bit set iff the character
  * sorts >= '8' — only [0-9a-f] occur, so that is exactly {8..f}).
  * Packs the first `SimhashBits` (32) digits of an md5 hex digest into
  * one long in a single pass.
  *
  * Replaces 32 separate `substring(h, j+1, 1) >= "8"` Catalyst string
  * comparisons per token — each of which allocates a 1-char
  * UTF8String — with one fused byte loop, on both the codegen and
  * interpreted paths. Bit-for-bit the same classification, so the
  * SimHash signatures (and every oracle built on them) are unchanged.
  *
  * TRUNCATION CONTRACT: the loop reads `min(bits, input.length)`
  * characters — exactly what `substring` past the end of the string
  * yields ("" → bit unset is replaced here by loop exit). `bits`
  * beyond the digest length therefore produces a mask of only
  * `input.length` bits, with NO error: e.g. bits=64 over a 32-char
  * md5 digest is a 32-bit mask. Callers wanting a hard failure on
  * short inputs must validate digest length upstream; the expression
  * mirrors substring's permissive semantics on purpose so its
  * oracle-SQL twin (per-position substr comparisons) can never
  * diverge from it on ragged input.
  */
case class HexHighBits(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && bits >= 1 && bits <= 64)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hex_high_bits expects (STRING, 1..64 bits), got " +
        s"${child.dataType.simpleString} with bits=$bits")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = math.min(bits, bytes.length)
    var mask = 0L
    var j = 0
    while (j < n) {
      if (bytes(j) >= '8') mask |= (1L << j)
      j += 1
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $n = Math.min($bits, $bytes.length);
         |${ev.value} = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($bytes[$j] >= (byte) '8') ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HexHighBits = copy(child = newChild)
}

object HexHighBits {
  def apply(c: Column, bits: Int): Column =
    ColumnBridge.column(HexHighBits(ColumnBridge.expression(c), bits))
}
