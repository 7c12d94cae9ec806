package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot MERGE (upsert) — warehouse-maintenance semantics on plain
  * parquet tables: `MERGE INTO base USING updates ON key WHEN MATCHED
  * UPDATE ALL WHEN NOT MATCHED INSERT ALL`, expressed as one
  * co-partitioned full-outer join with updates winning per column.
  *
  * Scale shape: a single keyed shuffle of both sides (or zero
  * shuffles if base and updates are bucketed on the key — see
  * PlanSpec's bucketed-join proof); no driver-side state, no
  * row-by-row upsert loop.
  */
object Merge {

  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val merged = base.as("b").join(updates.as("u"),
      col(s"b.$key") === col(s"u.$key"), "full_outer")
    merged.select(base.columns.toSeq.map(c =>
      coalesce(col(s"u.$c"), col(s"b.$c")).as(c)): _*)
  }

  /** SCD type-2 reconstruction: a keyed changelog → versioned
    * dimension rows with [valid_from, valid_to) intervals and an
    * is_current flag — the standard warehouse history table built
    * from a CDC feed (the other direction of [[graft.operators.Quality.snapshotDiff]]:
    * diff produces the changelog, this replays it into history).
    * `valid_to` is the NEXT change's timestamp (half-open intervals —
    * an as-of lookup at time t is `valid_from <= t < valid_to`, which
    * composes with [[graft.operators.Joins]]' as-of machinery);
    * the open version has valid_to NULL. Ordering ties break on
    * `tiebreak` so versions are total-ordered deterministically.
    *
    * One keyed shuffle (the window partition) — the same cost as any
    * per-key ordering pass; nothing global, nothing quadratic.
    */
  def scd2(changes: DataFrame, key: String, ts: String,
           tiebreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Deterministic demo feed for the oracle: every 10th customer gets
    * an account-balance bump (matched → update), and a shifted-key
    * copy of every 100th customer arrives as a new row (not matched →
    * insert).
    */
  def customerUpserts(customer: DataFrame): DataFrame = {
    val updates = customer.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
    val inserts = customer.filter(col("c_custkey") % 100 === 0)
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
      .withColumn("c_name", concat(lit("new_"), col("c_name")))
    updates.unionByName(inserts)
  }
}
