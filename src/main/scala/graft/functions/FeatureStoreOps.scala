package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-store PERSISTENCE surface — the write side of the
  * reference's FeatureStore (FeatureStore.java:21-399 registers
  * feature definitions and stores resolved values;
  * docker/postgres/init.sql:59-94 is the backing catalog: `features`
  * definition rows keyed by feature_id, `feature_values` long-form
  * rows keyed by (feature_id, entity_id, event_timestamp)).
  * [[FeatureRegistry]] covers the stats/profiling half; this object
  * completes the analog with the two persisted tables.
  *
  * Layout: both tables go through
  * [[graft.operators.Layout.writeRangeLayout]] — `feature_values`
  * range-partitioned on `feature_id`, so each output file owns a
  * disjoint feature span and a single-feature read prunes at the
  * file level (the parquet twin of init.sql's
  * idx_feature_values_feature_id); the definitions table is
  * catalog-sized. The values table is the reference's narrow
  * long-form schema: feature_name/type live ONLY in the definitions
  * table, so a read-back must join — exactly the normalized shape the
  * reference's store has, and the join is a broadcast (definitions
  * are a catalog).
  *
  * The long form is built with ONE `stack` pass over the registered
  * feature frame (row-local expansion — no per-feature rescan of the
  * events), k× the scan in rows at 100 TB, same as the registry's
  * stats operators.
  */
object FeatureStoreOps {

  /** Deterministic feature_id (init.sql's VARCHAR(32) key): first 8
    * hex digits of md5("feat:" + name) — reproducible in any engine.
    */
  def featureId(name: org.apache.spark.sql.Column) =
    substring(md5(concat(lit("feat:"), name)), 1, 8)

  /** The definitions table (init.sql `features`, FeatureStore.java
    * FeatureMetadata): one row per registered feature.
    */
  def definitions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FeatureRegistry.eventFeatures
      .map(f => (f.name, f.kind, f.description))
      .toDF("feature_name", "data_type", "description")
      .select(featureId(col("feature_name")).as("feature_id"),
        col("feature_name"), col("data_type"), col("description"),
        (col("feature_name") === "event_id").as("is_primary_key"),
        lit(false).as("is_event_time"),
        lit("1").as("version"))
  }

  /** Resolved values in the reference's long form (init.sql
    * `feature_values`): (feature_id, entity_id, value, event_ts).
    * Numeric and categorical features keep their native type in
    * separate nullable columns (the parquet twin of the JSONB value).
    */
  def resolvedValues(events: DataFrame): DataFrame = {
    val f = FeatureRegistry.eventFeatureFrame(events)
    val longForm = f.select(col("event_id").as("entity_id"), col("ts"),
      expr("""stack(5,
             |  'value', value, CAST(NULL AS STRING),
             |  'delta_prev', delta_prev, CAST(NULL AS STRING),
             |  'hour_of_day', hour_of_day, CAST(NULL AS STRING),
             |  'event_type', CAST(NULL AS DOUBLE), event_type,
             |  'period_of_day', CAST(NULL AS DOUBLE), period_of_day)
             |  AS (feature_name, value_num, value_str)""".stripMargin))
    longForm.select(featureId(col("feature_name")).as("feature_id"),
      col("entity_id"), col("value_num"), col("value_str"),
      col("ts").as("event_ts"))
  }

  /** Write both tables: values range-laid-out on feature_id (file
    * pruning per feature), definitions as the catalog table.
    */
  def writeStore(events: DataFrame, dir: String): Unit = {
    graft.operators.Layout.writeRangeLayout(
      resolvedValues(events), "feature_id", 4, s"$dir/feature_values")
    graft.operators.Layout.writeRangeLayout(
      definitions(events.sparkSession), "feature_id", 1, s"$dir/features")
  }

  /** Read-back audit over the PERSISTED tables: per feature (name and
    * type recovered by joining the definitions catalog — the values
    * table doesn't carry them), row/present/entity counts and the
    * exact scaled-BIGINT value sum. This is the oracle-checked proof
    * that what was written is what the source contained.
    */
  def readBack(spark: SparkSession, dir: String): DataFrame = {
    val values = spark.read.parquet(s"$dir/feature_values")
    val defs = spark.read.parquet(s"$dir/features")
      .select("feature_id", "feature_name", "data_type")
    values.join(broadcast(defs), "feature_id")
      .groupBy(col("feature_id"), col("feature_name"), col("data_type"))
      .agg(count(lit(1)).as("n_values"),
        (count(col("value_num")) + count(col("value_str")))
          .as("n_present"),
        countDistinct(col("entity_id")).as("n_entities"),
        sum(round(col("value_num") * lit(1.0e4)).cast("long"))
          .as("sum_scaled"))
  }

  /** The full round trip (the q_feature_store query): write the
    * store from events, then audit it by reading the parquet back.
    */
  def roundTrip(events: DataFrame, dir: String): DataFrame = {
    writeStore(events, dir)
    readBack(events.sparkSession, dir)
  }
}
