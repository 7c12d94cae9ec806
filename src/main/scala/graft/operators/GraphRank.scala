package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over the user↔merchant interaction graph —
  * the random-walk centrality underlying the reference's GNN feature
  * prep (graph_neural_network.py:338-392 stops at degree; this is the
  * next rung: influence that flows through shared merchants).
  *
  * Ranks are kept as SCALED BIGINTs (10⁶ = rank 1.0) with an explicit
  * floor at each contribution: pr' = ⌊0.15·S⌋ + Σ ⌊pr·85/(100·deg)⌋.
  * Integer state makes the iteration exact — no float drift across
  * engines, shuffle orders, or retries (the classic fixed-point trick
  * production graph engines use for reproducible ranks). Each
  * iteration is one keyed join + one keyed sum — the standard
  * pregel-style PR shape — with a localCheckpoint lineage cut per
  * round (same rationale as Dedup.connectedComponents).
  */
object GraphRank {
  val Scale = 1000000L

  /** PageRank on the bipartite user↔derived-merchant graph of the
    * events table, `iters` damped rounds (d = 0.85), node ids
    * prefixed `u:`/`m:`. Every node appears in the edge list, so
    * there are no dangling nodes by construction.
    */
  def pagerankBipartite(events: DataFrame, iters: Int = 3): DataFrame = {
    val edges = events.select(
        concat(lit("u:"), col("user_id").cast("string")).as("a"),
        concat(lit("m:"), pmod(col("event_id") * 7, lit(97L)).cast("string"))
          .as("b"))
      .distinct()
    val sym = OperatorCaches.track(
      edges.unionByName(edges.select(col("b").as("a"), col("a").as("b"))))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    // LAZY caches, not eager checkpoints: the round count is FIXED
    // (no convergence action), so the whole iteration stays one lazy
    // plan materialized by the caller's single action — each round's
    // frame is cached because the next round references it twice
    // (contribution join + rank-update join); without the cache the
    // recompute would be exponential in rounds. Bounded plan growth
    // (2^iters ≈ 8 copies) is fine for analysis at this depth — the
    // convergence-LOOP operators (connectedComponents) still need
    // eager lineage cuts.
    var pr = OperatorCaches.track(
      deg.select(col("a").as("node"), lit(Scale).as("pr"), col("deg")))
    for (_ <- 0 until iters) {
      val contrib = sym.join(pr, sym("a") === pr("node"))
        .select(sym("b").as("dst"),
          floor((col("pr") * 85).cast("double") / (col("deg") * 100))
            .cast("long").as("c"))
      val sums = contrib.groupBy("dst").agg(sum(col("c")).as("in_sum"))
      pr = OperatorCaches.track(
        pr.join(sums, pr("node") === sums("dst"), "left")
          .select(col("node"),
            (lit(Scale * 15 / 100) + coalesce(col("in_sum"), lit(0L)))
              .as("pr"),
            col("deg")))
    }
    pr.select(col("node"), col("pr"))
  }
}
