package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured (JSON / variant) column handling over the events
  * `props` payload — the schema-on-read surface the reference's JSON
  * pipeline implies (S2's tolerant parse, plus ad-hoc field access a
  * fraud analyst does in queries).
  *
  * Three extraction routes, all codegen-friendly:
  *  - `from_json` with an explicit schema → typed struct (the
  *    bulk-ETL route; malformed rows yield null, not failure);
  *  - `get_json_object` JSONPath (the ad-hoc route);
  *  - Spark 4 VARIANT (`parse_json` + `variant_get`) — the
  *    open-format binary JSON encoding for repeated sub-field access
  *    without re-parsing.
  */
object SemiStructured {

  /** Extract `k` through all three routes (values must agree — the
    * oracle checks all three columns) plus a parse-health flag.
    */
  def jsonProps(events: DataFrame): DataFrame =
    graft.sources.Par.fan(events).select(
      col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k").as("k_struct"),
      get_json_object(col("props"), "$.k").cast("long").as("k_path"),
      variant_get(parse_json(col("props")), "$.k", "long").as("k_variant"),
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG")).isNotNull.as("parsed_ok"))

  /** Roll-up over an extracted field: the "group by a JSON field"
    * shape that must not re-parse per aggregate.
    */
  def jsonFieldRollup(events: DataFrame): DataFrame = {
    import graft.functions.ExactAgg._
    events
      .groupBy((from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k") % 10)
        .as("k_mod10"))
      .agg(count(lit(1)).as("n"),
           dsum(col("value")).as("total_value"))
  }
}
