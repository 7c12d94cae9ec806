package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Oracle-exact numeric aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial/final
  * aggregation order differs from any single-threaded oracle — so a
  * plain `sum(double)` is not reproducible across engines. These
  * helpers quantize each addend to a fixed decimal scale and sum as
  * BIGINT: `round(x·10^s)` is deterministic (both Spark and DuckDB
  * round ties away from zero on doubles), int64 addition is exact and
  * associative (shuffle-order-independent), and int64→double is a
  * correctly-rounded conversion in every engine. The same shape in
  * ANSI SQL ([[OracleSql]]) therefore produces bit-identical doubles
  * in DuckDB. (A DECIMAL-cast variant was rejected: DuckDB's
  * DECIMAL→DOUBLE cast divides the unscaled integer by 10^scale in
  * double arithmetic, which is not correctly rounded and diverges
  * from Spark/Java by 1 ulp.)
  *
  * Scale budget: |x|·10^s · rows must stay below 2^63 ≈ 9.2e18 —
  * e.g. s=4 supports 1e5-magnitude values across ~1e9 rows. These
  * helpers exist for the cross-engine oracle; the throughput path
  * uses plain `sum`/`stddev_pop` (see callers).
  *
  * All helpers stay inside whole-stage codegen and partial (map-side)
  * aggregation — constant-factor cost over a double sum, no plan
  * change.
  */
object ExactAgg {

  /** Exact, order-independent SUM of a double expression, quantized
    * to `scale` decimal places.
    */
  def dsum(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale)
    sum(round(c * lit(f)).cast(LongType)).cast(DoubleType) / lit(f)
  }

  /** Mean via exact sum / count — bit-identical across engines. */
  def davg(c: Column, scale: Int = 4): Column = dsum(c, scale) / count(c)

  /** Population stddev via exact sums of x (scale 4) and x² (scale 0).
    * Same formula, same IEEE op order as `OracleSql.dstd`, so the
    * resulting double matches DuckDB bit-for-bit.
    */
  def dstd(c: Column): Column = {
    val n  = count(c).cast(DoubleType)
    val s  = dsum(c)
    val s2 = dsum(c * c, 0)
    sqrt(greatest(lit(0.0), s2 / n - (s / n) * (s / n)))
  }
}

/** SQL (DuckDB-dialect-compatible ANSI) twins of [[ExactAgg]] — used to
  * assemble `SparkEntry.oracleSql` strings so the Spark and oracle
  * expressions can never drift apart.
  */
object OracleSql {
  private def pow10(scale: Int): String = s"1.0e$scale"

  def dsum(x: String, scale: Int = 4): String = {
    val f = pow10(scale)
    s"(CAST(SUM(CAST(ROUND(($x) * $f, 0) AS BIGINT)) AS DOUBLE) / $f)"
  }

  def davg(x: String, scale: Int = 4): String =
    s"(${dsum(x, scale)} / COUNT($x))"

  def dstd(x: String): String = {
    val n  = s"CAST(COUNT($x) AS DOUBLE)"
    val s  = dsum(x)
    val s2 = dsum(s"($x) * ($x)", 0)
    s"SQRT(GREATEST(0.0, $s2 / $n - ($s / $n) * ($s / $n)))"
  }
}
