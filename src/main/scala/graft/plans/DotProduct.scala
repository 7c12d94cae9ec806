package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product Σ a[i]·b[i] over two array<double>
  * columns — the kernel under every cosine in the ANN/dedup family.
  *
  * Why native: the `zip_with + aggregate` spelling evaluates through
  * HigherOrderFunction lambdas and materializes an intermediate
  * 64-element array PER PAIR; the fully unrolled 64-term expression
  * blows HotSpot's 8 KB JIT limit and runs interpreted
  * (Similarity.dot's scaladoc documents both measurements). This
  * expression emits ONE fused loop in `doGenCode` — no intermediate
  * array, no lambda dispatch, JIT-compilable — and falls back to an
  * equivalent interpreted loop off the codegen path.
  *
  * Value parity: the loop accumulates `0.0 + p₀ + p₁ + …` in index
  * order — exactly the left association of both the HOF fold and the
  * oracle SQL's explicit `a[1]*b[1] + … + a[64]*b[64]` chain, so
  * results are bit-identical and the DuckDB gate is unaffected.
  * Null semantics match `zip_with`: null array, mismatched lengths
  * (zip_with pads with null), or any null element → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_d expects 2 ARRAY<DOUBLE> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $sum = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(newLeft, newRight)
}

object DotProduct {
  /** Column-API entry point over array<double> columns. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
