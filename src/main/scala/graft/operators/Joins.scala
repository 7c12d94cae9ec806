package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bounded, banded, and graph-shaped joins from SURVEY §2.3. */
object Joins {

  /** J3-style interval join: pairs of same-key events where the right
    * event falls in (left.ts, left.ts + window]. In batch this is a
    * sort-merge equi-join on the key with a range residual; under
    * Structured Streaming the identical predicate shape (watermark +
    * time-range condition) is the canonical stream-stream join. The
    * equi-key keeps the shuffle keyed — never a cross product.
    */
  def intervalJoin(events: DataFrame, key: String, ts: String,
                   windowExpr: String = "INTERVAL 5 MINUTES"): DataFrame = {
    val a = events.select(col(key).as("k"), col(ts).as("ts_a"),
      col("event_id").as("eid_a"), col("event_type").as("type_a"))
    val b = events.select(col(key).as("k2"), col(ts).as("ts_b"),
      col("event_id").as("eid_b"), col("event_type").as("type_b"))
    a.join(b, col("k") === col("k2") &&
        col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(windowExpr))
      // J3's correlation risk factors (StreamJoiner.java:183-206):
      // cross-stream event kinds bump a risk column
      .withColumn("pair_risk",
        when(col("type_b") === "error", 0.3)
          .when(col("type_b") === "login", 0.2)
          .otherwise(0.0))
      .select("k", "eid_a", "eid_b", "pair_risk")
      .withColumnRenamed("k", "user_id")
  }

  /** J5-style banded join: both sides keyed by a derived amount band,
    * pre-aggregated per band BEFORE the join so the join cardinality
    * is |bands|, not |rows|² — the scale-safe form of the reference's
    * bucketed similarity join (StreamJoiner.java:159-179,238-291).
    */
  def bandedJoin(lineitem: DataFrame, part: DataFrame,
                 width: Double = 1000.0): DataFrame = {
    import graft.functions.ExactAgg._
    val li = lineitem
      .groupBy(graft.functions.Features.amountBand(col("l_extendedprice"), width)
        .as("band"))
      .agg(count(lit(1)).as("n_li"), davg(col("l_extendedprice")).as("avg_li"))
    val p = part
      .groupBy(graft.functions.Features.amountBand(col("p_retailprice"), width)
        .as("band"))
      .agg(count(lit(1)).as("n_p"), davg(col("p_retailprice")).as("avg_p"))
    li.join(p, "band")
      // pattern-similarity scalar in the J5 spirit: relative distance
      // of the band means (exact double ops on both engines)
      .withColumn("band_similarity",
        lit(1.0) - abs(col("avg_li") - col("avg_p"))
          / greatest(col("avg_li"), col("avg_p")))
  }

  /** J7 graph neighborhood: bipartite co-occurrence — pairs of
    * suppliers sharing parts, with shared-neighbor counts (the
    * degree/centrality-style scalars the reference's GNN feature prep
    * computes — graph_neural_network.py:244-315 — via self-join on
    * the shared entity; distinct-edge projection first keeps the
    * self-join on the small edge set).
    */
  def coOccurrence(edges: DataFrame, src: String, via: String): DataFrame = {
    val e = edges.select(col(src).as("s"), col(via).as("v")).distinct()
    e.as("a").join(e.as("b"),
        col("a.v") === col("b.v") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("src_a"), col("b.s").as("src_b"))
      .agg(count(lit(1)).as("shared"))
  }
}
