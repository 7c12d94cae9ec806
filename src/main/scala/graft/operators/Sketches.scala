package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate aggregation surface for the 100 TB path — the sketch
  * counterparts of the exact aggregates the oracle gate checks.
  *
  * Exact `COUNT(DISTINCT)` / interpolated percentiles shuffle every
  * distinct value; at cluster scale the sketch forms bound state to
  * KBs per group with a few-percent error: HyperLogLog++
  * (`approx_count_distinct`), t-digest-backed `approx_percentile`,
  * and Count–Min Sketch / frequent-items via DataFrame.stat. All are
  * mergeable (partial aggregation stays map-side) and
  * deterministic-per-dataset, but NOT cross-engine reproducible — so
  * they are test-covered against their exact twins (SketchesSpec
  * bounds the relative error) instead of oracle-checked.
  */
object Sketches {

  /** Per-key approximate distinct counts next to the exact ones the
    * oracle checks (rsd = relative standard deviation of the HLL++).
    */
  def approxUserTypes(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("user_id"))
      .agg(approx_count_distinct(col("event_type"), rsd).as("n_types_approx"),
           countDistinct(col("event_type")).as("n_types_exact"))

  /** Global approximate percentiles (t-digest accuracy parameter) vs
    * the exact interpolated ones.
    */
  def approxValuePercentiles(events: DataFrame,
                             accuracy: Int = 10000): DataFrame =
    events.agg(
      percentile_approx(col("value"), array(lit(0.5), lit(0.95)),
        lit(accuracy)).as("p_approx"),
      expr("percentile(value, array(0.5, 0.95))").as("p_exact"))

  /** Count–Min Sketch over a column: returns estimated counts for the
    * given probe values (DataFrame.stat.countMinSketch — mergeable,
    * fixed width/depth state).
    */
  def cmsCounts(events: DataFrame, column: String, probes: Seq[String],
                eps: Double = 0.001, confidence: Double = 0.99,
                seed: Int = 42): Seq[(String, Long)] = {
    val sketch = events.stat.countMinSketch(col(column), eps, confidence, seed)
    probes.map(p => p -> sketch.estimateCount(p))
  }

  /** Frequent items (the reference's "top merchants" style question at
    * sketch cost): values whose frequency exceeds `support`.
    */
  def frequentItems(events: DataFrame, column: String,
                    support: Double = 0.01): DataFrame =
    events.stat.freqItems(Array(column), support)
}
