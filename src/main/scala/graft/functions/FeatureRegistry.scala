package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg._

/** A10 feature-store registry surface — the declarative re-expression
  * of the reference's FeatureStore (FeatureStore.java:21-399: feature
  * registration metadata, per-feature statistics incl. null rates, and
  * categorical value counts; docker/postgres/init.sql:59-94 is the
  * backing catalog schema).
  *
  * The catalog is a static registry of [[FeatureDef]]s; the stats
  * operators derive their unpivot columns FROM the registry, so a
  * feature added to the catalog is automatically profiled. Both stats
  * shapes are single-shuffle: unpivot (`stack`) is a narrow per-row
  * expansion, then one partial+final aggregate by feature name (+
  * value for categorical counts) — at 100 TB the cost is k× the scan
  * (k = features profiled), with no joins and no second shuffle except
  * the tiny per-feature share window over the already-aggregated
  * counts.
  */
object FeatureRegistry {

  /** Registry row (FeatureStore.java:21-64 metadata). */
  final case class FeatureDef(name: String, kind: String,
                              description: String)

  /** The registered features over the events stream. */
  val eventFeatures: Seq[FeatureDef] = Seq(
    FeatureDef("value", "numeric", "raw event amount"),
    FeatureDef("delta_prev", "numeric",
      "amount delta vs previous event of the same user (null on first)"),
    FeatureDef("hour_of_day", "numeric", "event hour 0-23"),
    FeatureDef("event_type", "categorical", "event class"),
    FeatureDef("period_of_day", "categorical", "coarse time-of-day bucket"))

  def numericNames: Seq[String] =
    eventFeatures.filter(_.kind == "numeric").map(_.name)
  def categoricalNames: Seq[String] =
    eventFeatures.filter(_.kind == "categorical").map(_.name)

  /** The registry itself as a queryable DataFrame (the catalog table). */
  def catalog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    eventFeatures.toDF("feature_name", "kind", "description")
  }

  /** Materialize every registered feature as a column over events
    * (plus the event time, which the feature-store write surface
    * persists as `event_ts`).
    */
  def eventFeatureFrame(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("event_id"),
      col("value"),
      (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
      hour(col("ts")).cast("double").as("hour_of_day"),
      col("event_type"),
      Features.periodOfDay(col("ts")).as("period_of_day"),
      col("ts"))
  }

  private def stackExpr(names: Seq[String]): String =
    s"stack(${names.size}, " +
      names.map(n => s"'$n', $n").mkString(", ") +
      ") as (feature_name, x)"

  /** Numeric registry statistics: row/present counts, null rate,
    * min/max, exact mean, distinct cardinality — per registered
    * numeric feature (FeatureStore.java:204-320 computeStatistics).
    */
  def numericStats(events: DataFrame): DataFrame =
    eventFeatureFrame(events)
      .select(expr(stackExpr(numericNames)))
      .groupBy(col("feature_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("x")).as("n_present"),
        (lit(1.0) - count(col("x")).cast("double")
          / count(lit(1)).cast("double")).as("null_rate"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"),
        davg(col("x")).as("mean_x"),
        countDistinct(col("x")).as("n_distinct"))

  /** Categorical value counts + in-feature share
    * (FeatureStore.java:204-320 categorical distribution tracking).
    */
  def valueCounts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("feature_name"))
    eventFeatureFrame(events)
      .select(expr(stackExpr(categoricalNames)))
      .groupBy(col("feature_name"), col("x").as("value"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(w).cast("double"))
  }
}
