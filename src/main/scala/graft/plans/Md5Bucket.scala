package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5 hash-bucket kernel: `(first md5 byte of the UTF-8 input)
  * mod modulus` — the engine's cross-engine hash-coin
  * (`dsirWeights` buckets, `maskTokens` coins, the established
  * "first two hex nibbles" spelling) computed in ONE digest pass with
  * no hex string.
  *
  * The composite expression it replaces — `md5(tok)` (digest + 32-char
  * hex encode + UTF8String alloc) then two `substring` calls (two more
  * 1-char allocs) and two 16-arm CASE lookups — spends most of its
  * cycles on the hex round-trip that exists only so the bucket could
  * be parsed back OUT of it. Value-identical by construction:
  * `nibble(hex[0])·16 + nibble(hex[1])` IS the first digest byte, and
  * the byte is non-negative so `%` equals `pmod`. The DuckDB oracle
  * twins keep the hex-substring spelling — equality of results is
  * exactly the cross-engine contract the md5 discipline exists for.
  *
  * The MessageDigest instance is cached per task thread (codegen:
  * one mutable-state instance per operator; interpreted: a
  * thread-local), so the per-row cost is one MD5 block pass over the
  * token bytes and one modulo.
  */
case class Md5Bucket(child: Expression, modulus: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && modulus >= 1 && modulus <= 256)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_bucket expects (STRING, 1..256 modulus), got " +
        s"${child.dataType.simpleString} with modulus=$modulus")

  override protected def nullSafeEval(input: Any): Any = {
    val d = Md5Bucket.digestTL.get()
    val out = d.digest(input.asInstanceOf[UTF8String].getBytes)
    (out(0) & 0xFF) % modulus
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "md5md",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e); }""".stripMargin)
    nullSafeCodeGen(ctx, ev, s => {
      val d = ctx.freshName("digest")
      s"""
         |byte[] $d = $md.digest($s.getBytes());
         |${ev.value} = ($d[0] & 0xFF) % $modulus;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Md5Bucket = copy(child = newChild)
}

object Md5Bucket {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(c: Column, modulus: Int): Column =
    ColumnBridge.column(Md5Bucket(ColumnBridge.expression(c), modulus))
}
