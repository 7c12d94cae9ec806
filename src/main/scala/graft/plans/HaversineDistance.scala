package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Native Catalyst expression for the haversine great-circle distance
  * (km) — the one scalar in the reference worth promoting past column
  * math (reference: features/FeatureExtractor.java:407-417): arity-4,
  * trig-heavy, used in the hot scoring path.
  *
  * `doGenCode` emits a single fused Java expression, so one call
  * replaces the ~12 intermediate Catalyst nodes of the composed form —
  * same semantics (java.lang.Math throughout, identical to the
  * `functions._` composition), smaller generated code, fewer boxed
  * intermediates. Falls back to `nullSafeEval` off the codegen path.
  */
case class HaversineDistance(lat1: Expression, lon1: Expression,
                             lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"haversine_km expects 4 DOUBLE arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  @inline private def compute(la1: Double, lo1: Double,
                              la2: Double, lo2: Double): Double = {
    val dLat = math.toRadians(la2 - la1)
    val dLon = math.toRadians(lo2 - lo1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    6371.0 * 2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
  }

  override protected def nullSafeEval(v1: Any, v2: Any,
                                      v3: Any, v4: Any): Any =
    compute(v1.asInstanceOf[Double], v2.asInstanceOf[Double],
            v3.asInstanceOf[Double], v4.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la1, lo1, la2, lo2) => {
      val dLat = ctx.freshName("dLat")
      val dLon = ctx.freshName("dLon")
      val h = ctx.freshName("h")
      s"""
         |double $dLat = Math.toRadians($la2 - $la1);
         |double $dLon = Math.toRadians($lo2 - $lo1);
         |double $h = Math.sin($dLat / 2) * Math.sin($dLat / 2)
         |  + Math.cos(Math.toRadians($la1)) * Math.cos(Math.toRadians($la2))
         |    * Math.sin($dLon / 2) * Math.sin($dLon / 2);
         |${ev.value} = 6371.0 * 2.0
         |  * Math.atan2(Math.sqrt($h), Math.sqrt(1.0 - $h));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineDistance =
    copy(newFirst, newSecond, newThird, newFourth)
}

object HaversineDistance {
  /** Column-API entry point: `haversine_km(lat1, lon1, lat2, lon2)`. */
  def apply(lat1: Column, lon1: Column,
            lat2: Column, lon2: Column): Column =
    ColumnBridge.column(HaversineDistance(
      ColumnBridge.expression(lat1.cast("double")),
      ColumnBridge.expression(lon1.cast("double")),
      ColumnBridge.expression(lat2.cast("double")),
      ColumnBridge.expression(lon2.cast("double"))))
}
