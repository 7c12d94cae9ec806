package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Maintained n-gram novelty — the continuous-ingest face of
  * [[graft.operators.Dedup.ngramNovelty]]: each micro-batch is scored
  * against the STANDING gram store (everything ingested before it),
  * then the store absorbs the batch's first-seen grams. This is the
  * production form of the novelty signal — "how much of this crawl
  * snapshot is new relative to what we already hold" — computed
  * without ever rescoring the corpus.
  *
  * == Parity with the batch operator ==
  * Within a batch, attribution is min doc_id — the batch operator's
  * exact rule — so ingesting a corpus in doc_id-ordered batches
  * reproduces [[Dedup.ngramNovelty]] ROW-FOR-ROW (DocOpsSpec pins the
  * equality across a 3-batch fold). Out-of-order ingest diverges by
  * design: the introducer becomes "first batch seen", which is the
  * semantics a stream actually wants (the batch operator's min-id is
  * its deterministic stand-in).
  *
  * == Scale shape ==
  * Per batch: one gram explode over the BATCH only, one left-anti
  * probe of the store (gram-keyed equi-join — bucket the store by
  * gram hash and the probe prunes to matching buckets), one batch-
  * keyed aggregate, and a store append of the batch's distinct new
  * grams. The store is touched only by keyed joins; nothing rescans
  * it per document. State lineage is cut by an eager
  * `localCheckpoint` every ingest, the same discipline as
  * [[StreamClusters]].
  */
object StreamNovelty {

  /** Standing gram store: one row per distinct gram ever ingested.
    * `gramRows` is computed ON DEMAND from the checkpointed store —
    * maintaining it eagerly cost every ingest batch an extra Spark
    * job (`intro.count()`) solely to keep a counter most callers
    * never read.
    */
  final case class NoveltyState(grams: DataFrame) {
    def gramRows: Long = grams.count()
  }

  def emptyState(spark: SparkSession): NoveltyState = {
    import spark.implicits._
    NoveltyState(Seq.empty[String].toDF("sh"))
  }

  /** Maintenance hook for long-running ingest: rewrite the standing
    * store through `keep` (drop hash bands, apply a caller-tracked
    * TTL, downsample). The store holds DISTINCT grams, so it grows
    * with vocabulary (sub-linear in ingested tokens — SoakAudit
    * measures the curve), but an unbounded run still wants a pruning
    * valve. Semantics after compaction: a dropped gram scores as
    * novel again on next sight — the standard trade of any TTL'd
    * dedup store.
    */
  def compact(state: NoveltyState,
              keep: org.apache.spark.sql.Column): NoveltyState =
    NoveltyState(state.grams.filter(keep).localCheckpoint(true))

  /** Score one ingest batch against the standing store and absorb its
    * new grams. Returns (per-doc novelty rows, updated state) — the
    * output schema is [[Dedup.ngramNovelty]]'s exactly.
    */
  def ingest(state: NoveltyState, batch: DataFrame, n: Int = 3)
      : (DataFrame, NoveltyState) = {
    // cache: the batch gram view feeds the anti-probe AND the scorer
    val g = Dedup.ngrams(batch, n).localCheckpoint(true)
    val intro = g.join(state.grams, Seq("sh"), "left_anti")
      .groupBy("sh").agg(min(col("doc_id")).as("intro_id"))
      .localCheckpoint(true)
    // the scoring tail IS the batch operator's (shared definition) —
    // grams already in the store simply have no introducer row
    val out = Dedup.noveltyFromIntro(batch, g, intro)
    val newStore = state.grams.union(intro.select("sh"))
      .localCheckpoint(true)
    (out, NoveltyState(newStore))
  }
}
