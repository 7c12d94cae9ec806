package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Maintained winnowing-overlap detection — the continuous-ingest
  * face of [[graft.operators.TextAnalysis.winnowOverlap]]: each
  * micro-batch's fingerprint set is computed by the BATCH operator's
  * extraction verbatim ([[TextAnalysis.winnowFingerprints]] — shared
  * tail, the house twin discipline), overlap pairs are emitted
  * against the STANDING store plus within the batch, and the store
  * absorbs the batch. This is the production form of plagiarism /
  * cross-crawl contamination detection: every ingested snapshot is
  * checked against everything already held, without ever re-pairing
  * the corpus with itself.
  *
  * == Parity with the batch operator ==
  * On data where no fingerprint's document frequency ever exceeds
  * `maxDocFreq`, the UNION of per-batch outputs over a full ingest
  * equals [[TextAnalysis.winnowOverlap]] ROW-FOR-ROW, for ANY batch
  * order: an unordered pair (x, y) is emitted exactly once — by the
  * batch that ingests the later of the two (cross-probe) or both
  * (within-batch self-join) — and by then every shared fingerprint of
  * the pair is visible (DocOpsSpec pins the 3-batch fold equality).
  *
  * == Documented divergence (same class as [[StreamDedup]]'s) ==
  * The df cap is checked against the document frequency SO FAR
  * (store + this batch); the batch operator caps on final corpus-wide
  * df. A fingerprint that crosses the cap mid-ingest has already
  * paired its early documents — the stream errs toward EXTRA pairs,
  * never misses ones the batch form would emit among already-seen
  * docs.
  *
  * == State layout (base + delta changelog — r13 ADVICE) ==
  * The pre-r14 store was `union(batch).localCheckpoint(true)` every
  * ingest — an O(store) rewrite per batch, the exact pattern the r9
  * soak flagged on the label store (its wall rose ~2.9×). The store
  * is now a compaction-time BASE plus a changelog of per-batch delta
  * segments: ingest appends the batch's (already checkpointed)
  * fingerprint frame as ONE new segment — zero store rows copied —
  * and [[consolidate]] folds the changelog into a fresh base, an
  * O(store) log compaction amortized by its trigger interval
  * (`maxDeltas` auto-triggers it so an unmanaged caller's plan depth
  * and file count stay bounded; a scheduled caller consolidates on
  * its own cycle like [[CurationLoop]] does for the cluster store).
  * Readers see `fps` — the lazy union of base + segments — so probe
  * shape and parity semantics are unchanged.
  *
  * == Scale shape ==
  * Per batch: one fingerprint extraction over the BATCH only, one
  * fp-keyed semi-probe of the store (bucket the store by fp and the
  * probe prunes to matching buckets — never a store scan), df checks
  * on TOUCHED fingerprints only, and an O(batch) segment append.
  * State lineage is cut by the per-segment `localCheckpoint`.
  */
object StreamWinnow {

  /** Standing fingerprint store: one row per (doc_id, fp) ever
    * ingested (post-winnowing selection, pre-df-cap — the cap is a
    * probe-time decision because df evolves). `base` is the last
    * consolidation's fold; `deltas` are per-batch checkpointed
    * segments appended since.
    */
  final case class WinnowState(base: DataFrame, deltas: Vector[DataFrame]) {
    /** Every stored (doc_id, fp) row: base + changelog, lazily. */
    def fps: DataFrame = deltas.foldLeft(base)(_ union _)
    def fpRows: Long = fps.count()
  }

  def emptyState(spark: SparkSession): WinnowState = {
    import spark.implicits._
    WinnowState(Seq.empty[(Long, String)].toDF("doc_id", "fp"), Vector.empty)
  }

  /** Fold the delta changelog into a fresh checkpointed base — the
    * O(store) compaction, amortized by the caller's schedule (or the
    * `maxDeltas` backstop in [[ingest]]).
    */
  def consolidate(state: WinnowState): WinnowState =
    if (state.deltas.isEmpty) state
    else WinnowState(state.fps.localCheckpoint(true), Vector.empty)

  /** Score one ingest batch against the standing store and absorb it.
    * Returns (overlap pairs involving this batch, updated state) —
    * the output schema is [[TextAnalysis.winnowOverlap]]'s exactly.
    */
  def ingest(state: WinnowState, batch: DataFrame, k: Int = 8,
             w: Int = 10, minShared: Long = 2, maxDocFreq: Long = 100,
             maxDeltas: Int = 16): (DataFrame, WinnowState) = {
    // cache: the batch fingerprint view feeds the df check, both join
    // sides, and the store append
    val bf = TextAnalysis.winnowFingerprints(batch, k, w)
      .localCheckpoint(true)
    val bdf = bf.groupBy("fp").agg(count(lit(1)).as("bdf"))
    // store rows on the batch's fingerprints ONLY (keyed semi-probe)
    val touched = state.fps.join(bdf.select("fp"), "fp")
      .localCheckpoint(true)
    val sdf = touched.groupBy("fp").agg(count(lit(1)).as("sdf"))
    val okFps = bdf.join(sdf, Seq("fp"), "left")
      .filter(col("bdf") + coalesce(col("sdf"), lit(0L)) <= maxDocFreq)
      .select("fp")
    val bOk = bf.join(okFps, "fp")
    val sOk = touched.join(okFps, "fp")
    // cross pairs: store doc × batch doc on shared fp (doc ids are
    // distinct corpus-wide; orient to the batch contract doc_a<doc_b)
    val cross = sOk.select(col("doc_id").as("sid"), col("fp"))
      .join(bOk.select(col("doc_id").as("bid"), col("fp")), "fp")
      .select(least(col("sid"), col("bid")).as("doc_a"),
        greatest(col("sid"), col("bid")).as("doc_b"))
    val within = bOk.as("a").join(bOk.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val pairs = cross.union(within)
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // O(batch) append: bf is already a checkpointed segment
    val appended = WinnowState(state.base, state.deltas :+ bf)
    val newState = if (appended.deltas.size >= maxDeltas)
      consolidate(appended) else appended
    (pairs, newState)
  }

  /** Maintenance hook for long-running ingest, mirroring
    * [[StreamNovelty.compact]]: rewrite the store through `keep`
    * (TTL by a caller-tracked doc set, drop hot fingerprints). Also
    * consolidates — the filter already pays the O(store) scan.
    * Semantics after compaction: overlaps against dropped rows are
    * no longer detected — the standard trade of any TTL'd store.
    */
  def compact(state: WinnowState,
              keep: org.apache.spark.sql.Column): WinnowState =
    WinnowState(state.fps.filter(keep).localCheckpoint(true), Vector.empty)
}
