package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Incremental connected-component maintenance — the continuous-ingest
  * face of [[graft.operators.Dedup.connectedComponents]]: a stream of
  * near-dup edge batches keeps cluster labels current WITHOUT ever
  * recomputing the corpus-wide fixpoint.
  *
  * Per batch, only the components TOUCHED by a new edge are rebuilt:
  * the endpoints of the incoming edges name their current components,
  * the stored edges of exactly those components plus the new edges
  * form a subgraph, the batch fixpoint runs on that subgraph alone,
  * and its labels are APPENDED to a label changelog. Components no new
  * edge reaches are never read, never rewritten — per-batch cost is
  * O(|batch| + |touched components|) materialized work, independent of
  * corpus size, the same contract as
  * [[graft.operators.Dedup.incrementalDedup]] for pair classification.
  *
  * == State layout (base + delta changelog) ==
  * Both state frames are log-structured, so per-batch maintenance is
  * append-only:
  *
  *   - labels: `labelBase` (resolved (node, cluster_id) snapshot cut at
  *     the last compaction) plus `labelDelta`, a (node, cluster_id,
  *     seq) changelog of per-batch touched-slice segments. The current
  *     label of a node is its LATEST entry (max seq; base is seq 0) —
  *     resolved lazily by [[ClusterState.labels]] on the read path and
  *     at compaction, never per ingest. The r9 design rewrote the whole
  *     label store through `localCheckpoint` every batch — O(corpus)
  *     materialized per batch; this layout appends O(touched) instead.
  *   - edges: `starBase` (the star forest cut at the last compaction —
  *     spokes (cid, node) per component) plus `edgeDelta`, the
  *     append-only log of post-compaction batch segments.
  *
  * Per-batch reads of the standing state are SCANS probed by the
  * broadcast batch (semi-joins with the batch side broadcast), never
  * shuffles or rewrites of the corpus-side frames; at table scale the
  * two stores are keyed tables (e.g. bucketed parquet / Delta) and the
  * same probes are bucket-pruned point lookups — see
  * [[CurationLoop]]'s scaladoc for the bucketed-index form.
  *
  * == Touched-component lookup through the changelog ==
  * `touched` is the set of cluster_ids in ANY changelog entry of a
  * batch endpoint — a SUPERSET of the endpoints' current components
  * (stale entries name components since merged INTO a current one,
  * never an unrelated component, because labels only ever move whole
  * components under merges). The subgraph then pulls:
  *
  *   - base spokes whose `doc_a` (the compaction-time cid) is either a
  *     touched cid directly, or was relabeled since compaction with a
  *     touched cid (its relabel lives in `labelDelta`, because every
  *     merge appends entries for the WHOLE merged component);
  *   - delta edges whose endpoints carry a touched cid in
  *     `labelDelta` (a pair's endpoints are always relabeled at its
  *     own ingest batch, so the delta changelog alone covers them);
  *   - the new pairs.
  *
  * That union contains every edge of every touched current component
  * (wholeness — so the subgraph min-label is the component's global
  * min) and nothing outside those components (stale entries only pull
  * subsets of touched components), which StreamingSpec and
  * OperatorPropertySpec pin against the batch fixpoint, including
  * cross-batch merges, merges after compaction, and randomized
  * ingest/compact interleavings.
  *
  * [[compact]] resolves the changelog and cuts a fresh base — the
  * star forest bounds the edge store by O(paired nodes − components)
  * and the label store by O(paired nodes), the log-compaction shape of
  * a log-structured table. O(corpus) when it runs; size-triggered in
  * [[Maintainer]], schedule-triggered in [[CurationLoop.Runner]],
  * amortized never-per-batch.
  */
object StreamClusters {

  /** Log-structured label/edge store carried across batches — see the
    * object scaladoc for the base + delta layout. Use the [[edges]] /
    * [[labels]] views for reads; the raw fields are the ingest path's
    * append targets.
    */
  /** `labelDeltaRows` is the changelog's row count, maintained
    * incrementally at ingest (a count over the just-checkpointed
    * O(touched) slice — no standing-state scan): a big component
    * touched every batch appends O(component) label rows per batch
    * while the edge log grows only O(batch), so the compaction trigger
    * must watch BOTH logs or the changelog (and the per-ingest scans
    * over it) escapes the corpus-size bound.
    */
  final case class ClusterState(starBase: DataFrame, edgeDelta: DataFrame,
                                labelBase: DataFrame, labelDelta: DataFrame,
                                labelDeltaRows: Long, nextSeq: Long) {
    /** Every stored edge: compaction-time star forest + delta log. */
    def edges: DataFrame = starBase.unionAll(edgeDelta)
    /** Resolved current labels — latest changelog entry per node
      * (base is seq 0). An O(paired nodes) aggregation: the READ path
      * and [[compact]] pay it; ingest never does.
      */
    def labels: DataFrame =
      labelBase.withColumn("seq", lit(0L)).unionAll(labelDelta)
        .groupBy("node")
        .agg(max_by(col("cluster_id"), col("seq")).as("cluster_id"))
  }

  /** Per-ingest observability: subgraph size actually recomputed.
    * `touchedComponents` counts distinct changelog cids of the batch
    * endpoints — current components plus any stale aliases they held
    * since the last compaction (a superset; see the object scaladoc).
    */
  final class IngestAudit {
    @volatile var subgraphEdges: Long = -1L
    @volatile var touchedComponents: Long = -1L
  }

  private def emptyPairs(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType))))

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("node", LongType), StructField("cluster_id", LongType))))

  private def emptyLabelDelta(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("node", LongType), StructField("cluster_id", LongType),
        StructField("seq", LongType))))

  def emptyState(spark: SparkSession): ClusterState =
    ClusterState(emptyPairs(spark), emptyPairs(spark),
      emptyLabels(spark), emptyLabelDelta(spark), 0L, 1L)

  /** Fold one batch of (doc_a, doc_b) edges into the state. Materialized
    * work is O(|batch| + |touched components|): the only checkpoints cut
    * are the batch pairs, the touched-cid set, the subgraph, and its
    * labels. The standing base/delta frames are read as broadcast-probed
    * scans and appended to lazily (metadata-only unions).
    */
  def ingest(state: ClusterState, newPairs: DataFrame,
             audit: Option[IngestAudit] = None): ClusterState = {
    val pairs = newPairs.select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val ends = pairs.select(col("doc_a").as("node"))
      .unionAll(pairs.select(col("doc_b").as("node"))).distinct()
    // every cid a batch endpoint EVER held since the last compaction —
    // superset of the endpoints' current components, cheap to find
    // (one scan of the label store probed by the broadcast batch)
    val chlog = state.labelBase.withColumn("seq", lit(0L))
      .unionAll(state.labelDelta)
    val touched = chlog.join(broadcast(ends), Seq("node"), "left_semi")
      .select("cluster_id").distinct().localCheckpoint(true)
    // base spokes of touched components: a spoke's doc_a IS its
    // component's compaction-time cid; if that component merged since,
    // the cid node's own delta relabel names the merged cid
    val relabeledCids = state.labelDelta
      .join(broadcast(touched), Seq("cluster_id"), "left_semi")
      .select(col("node").as("doc_a"))
    val touchedKeys = touched.select(col("cluster_id").as("doc_a"))
      .unionAll(relabeledCids).distinct()
    val oldStar = state.starBase
      .join(broadcast(touchedKeys), Seq("doc_a"), "left_semi")
    // delta edges of touched components: endpoints of a delta edge are
    // always relabeled at its own ingest, so labelDelta alone covers
    // them — both probe frames here are delta-sized, bounded by the
    // compaction interval
    val oldDelta = state.edgeDelta
      .join(state.labelDelta.select(col("node").as("doc_a"), col("cluster_id")),
        Seq("doc_a"))
      .join(broadcast(touched), Seq("cluster_id"), "left_semi")
      .select("doc_a", "doc_b")
    val sub = oldStar.unionAll(oldDelta).unionAll(pairs)
      .distinct().localCheckpoint(true)
    audit.foreach { a =>
      a.subgraphEdges = sub.count()
      a.touchedComponents = touched.count()
    }
    val subNodes = sub.select(col("doc_a").as("node"))
      .unionAll(sub.select(col("doc_b").as("node"))).distinct()
      .withColumnRenamed("node", "doc_id")
    val obs = new org.apache.spark.sql.Observation()
    val subLabels = Dedup.connectedComponents(sub, subNodes)
      .withColumnRenamed("doc_id", "node")
      .withColumn("seq", lit(state.nextSeq))
      .observe(obs, count(lit(1)).as("rows"))
      .localCheckpoint(true)
    // the appended-changelog count (O(touched), feeds the Maintainer's
    // changelog bound) RIDES the slice's own checkpoint job as an
    // observe metric — the Dedup CC probe pattern — instead of costing
    // every ingest an extra count job; bounded wait, direct-count
    // fallback, identical value either way
    val appended =
      try {
        import scala.concurrent.Await
        import scala.concurrent.duration.DurationInt
        Await.result(obs.future, 30.seconds).getAs[Long]("rows")
      } catch {
        case _: scala.concurrent.TimeoutException => subLabels.count()
      }
    ClusterState(state.starBase, state.edgeDelta.unionAll(pairs),
      state.labelBase, state.labelDelta.unionAll(subLabels),
      state.labelDeltaRows + appended, state.nextSeq + 1)
  }

  /** Compact the store: resolve the label changelog into a fresh base
    * snapshot and replace the edge log with its star forest — each
    * component's edges become (cluster_id, node) spokes. A spanning
    * structure preserves exactly the connectivity future merges need
    * (a later edge touching any member pulls the WHOLE component back
    * through its spokes) while the edge store shrinks to
    * O(paired nodes − components) and the label store to
    * O(paired nodes), both independent of ingest volume. Labels are
    * unchanged; O(corpus) when it runs, amortized by the trigger.
    */
  def compact(state: ClusterState): ClusterState = {
    val resolved = state.labels.localCheckpoint(true)
    val spark = resolved.sparkSession
    val star = resolved.filter(col("node") =!= col("cluster_id"))
      .select(col("cluster_id").as("doc_a"), col("node").as("doc_b"))
      .localCheckpoint(true)
    ClusterState(star, emptyPairs(spark), resolved, emptyLabelDelta(spark),
      0L, state.nextSeq)
  }

  /** Full label view over a docs frame: paired nodes from the store
    * (changelog resolved — latest entry wins), singletons
    * identity-labeled — same output contract as the batch clusters
    * operator.
    */
  def labelsFor(state: ClusterState, docs: DataFrame,
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("node"))
      .join(state.labels, Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("cluster_id"), col("node")).as("cluster_id"))

  /** Soft-dedup sampling weights off the MAINTAINED label store: the
    * batch [[graft.operators.Dedup.softDedupWeights]] view (weight =
    * 1/cluster_size, every member kept) with labels read from the
    * incremental state instead of a full-corpus CC run — newly
    * ingested near-dup edges reweight the affected documents without
    * re-clustering the corpus. The size-window tail IS the batch
    * operator's tail, so with the same edge set the views are equal
    * (DocOpsSpec pins it).
    */
  def softWeightsFor(state: ClusterState, docs: DataFrame,
                     idCol: String = "doc_id"): DataFrame =
    graft.operators.Dedup.weightsFromLabels(
      labelsFor(state, docs, idCol), idCol)

  /** Streaming wiring: foreachBatch folds each micro-batch of edges
    * into the state via [[ingest]] — the caller reads `state()` for
    * the current labels between/after batches.
    *
    * Compaction is WIRED IN, not left to the caller (the round-7 gap:
    * `compact` existed and was property-tested, but this sink grew
    * the edge log with ingest volume forever): after each batch, if
    * the log holds more than `compactFactor` × paired-node rows, the
    * store is compacted. The paired-node count used by the trigger is
    * the EXACT count cut at the last compaction — a lower bound on the
    * current count (paired nodes only grow), so the trigger fires at
    * least as eagerly as one reading the live count, and no per-batch
    * corpus-sized count job exists at all (the r9 design spent an
    * observe-metric ride on it; the changelog layout spends nothing).
    * Post-batch invariant (StreamingSpec pins it over a long random
    * ingest): `edgeLogRows ≤ compactFactor × |paired nodes|` AND
    * `labelDeltaRows ≤ compactFactor × |paired nodes|`, so state is
    * bounded by CORPUS size, never by how much was ingested. The
    * label-changelog arm matters independently of the edge arm: one
    * big component re-touched every batch appends O(component) label
    * rows per batch against O(batch) edge rows, and the per-ingest
    * changelog scans grow with it — the edge trigger alone would
    * never fire.
    */
  final class Maintainer(spark: SparkSession,
                         compactFactor: Double = 3.0) {
    @volatile private var st: ClusterState = emptyState(spark)
    @volatile private var edgeRows: Long = 0L
    @volatile private var pairedAtCompact: Long = 0L
    @volatile private var nCompactions: Long = 0L
    def state(): ClusterState = st
    /** Rows currently in the edge store (maintained, not re-counted). */
    def edgeLogRows: Long = edgeRows
    /** Rows currently in the label changelog (maintained by ingest). */
    def labelDeltaRows: Long = st.labelDeltaRows
    def compactionCount: Long = nCompactions
    def sink(batch: DataFrame, batchId: Long): Unit = {
      val n = batch.count() // micro-batch size: O(batch)
      st = ingest(st, batch)
      edgeRows += n
      val bound = compactFactor * math.max(pairedAtCompact, 1L)
      if (edgeRows > bound || st.labelDeltaRows > bound) {
        st = compact(st)
        // both counts ride the compaction's checkpointed frames —
        // amortized into the compaction, never paid per batch
        pairedAtCompact = st.labelBase.count()
        edgeRows = st.starBase.count() // star forest: nodes − components
        nCompactions += 1
      }
    }
  }
}
