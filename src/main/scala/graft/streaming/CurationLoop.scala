package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Continuous corpus curation — the full production ingest loop the
  * streaming dedup pieces compose into, one micro-batch at a time:
  *
  *   1. CLASSIFY the batch against the standing corpus (exact-hash +
  *      MinHash band-key semi-joins — [[graft.operators.Dedup.incrementalDedup]]
  *      semantics);
  *   2. EXTRACT the batch's near-dup edges: batch×corpus probes via
  *      the band index, plus batch-internal band collisions;
  *   3. MAINTAIN cluster labels incrementally ([[StreamClusters]] —
  *      only components the new edges touch are rebuilt);
  *   4. GROW the indexes (exact hashes + band keys) by the batch.
  *
  * Invariant (pinned in StreamingSpec): since every unordered pair of
  * docs shares its band buckets exactly once across the ingest
  * history — at the later doc's batch — the CUMULATIVE edge set
  * equals `minhashCandidates` over the whole corpus, so the
  * maintained labels equal the batch `connectedComponents` over the
  * full-corpus candidate graph after every batch. Cost per batch is
  * O(|batch| probes + touched components), never O(corpus).
  *
  * Same documented df-cap divergence as [[StreamDedup]]: batch-side
  * signatures cap document frequency within the batch, the corpus
  * index capped at its own build time; identical results whenever no
  * shingle crosses the cap. State frames are lineage-cut per batch;
  * at scale they are tables (the indexes bucketed by their join
  * keys), and the loop body is exactly what a foreachBatch sink runs.
  */
object CurationLoop {

  final case class CurationState(exactIdx: DataFrame, bandIdx: DataFrame,
                                 clusters: StreamClusters.ClusterState)

  def emptyState(spark: org.apache.spark.sql.SparkSession): CurationState = {
    import spark.implicits._
    CurationState(
      Seq.empty[String].toDF("eh"),
      Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "bkey"),
      StreamClusters.emptyState(spark))
  }

  /** One ingest step: returns (per-doc statuses, updated state).
    * Statuses: `dup_exact` | `dup_near` | `new`, vs the PRE-batch
    * corpus (the incrementalDedup contract).
    */
  def ingest(state: CurationState,
             batch: DataFrame): (DataFrame, CurationState) = {
    val docs = batch.select(col("doc_id"), col("text")).localCheckpoint(true)
    val hashes = docs.select(col("doc_id"), md5(col("text")).as("eh"))
      .localCheckpoint(true)
    val keys = Dedup.bandKeys(Dedup.minhashSignatures(docs), 8, 2)
      .localCheckpoint(true)
    // 1. classify vs the pre-batch corpus
    val exactIds = hashes.join(state.exactIdx, Seq("eh"), "left_semi")
      .select("doc_id")
    val nearIds = keys.join(state.bandIdx.select("band", "bkey"),
        Seq("band", "bkey"), "left_semi")
      .select("doc_id").distinct()
    val statuses = docs.select(col("doc_id"))
      .join(exactIds.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, "dup_exact")
          .when(col("is_near") === 1, "dup_near")
          .otherwise("new").as("status"))
      .localCheckpoint(true)
    // 2. near-dup edges: batch-vs-corpus probes + batch-internal
    // collisions, canonical (min, max) orientation, each pair once
    val crossEdges = keys.as("b")
      .join(state.bandIdx.as("c"),
        col("b.band") === col("c.band") && col("b.bkey") === col("c.bkey") &&
        col("b.doc_id") =!= col("c.doc_id"))
      .select(least(col("b.doc_id"), col("c.doc_id")).as("doc_a"),
        greatest(col("b.doc_id"), col("c.doc_id")).as("doc_b"))
    val innerEdges = keys.as("x").join(keys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val edges = crossEdges.unionAll(innerEdges).distinct()
    // 3. incremental cluster maintenance on the new edges only
    val clusters = StreamClusters.ingest(state.clusters, edges)
    // 4. indexes grow by the batch
    val nextState = CurationState(
      state.exactIdx.unionAll(hashes.select("eh")).distinct()
        .localCheckpoint(true),
      state.bandIdx.unionAll(keys).localCheckpoint(true),
      clusters)
    (statuses, nextState)
  }
}
