package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Incremental retrieval-index maintenance — the continuous-ingest
  * face of [[graft.operators.Retrieval.bm25TopK]]: documents arrive
  * in micro-batches and become searchable immediately, without ever
  * re-tokenizing the corpus.
  *
  * Everything BM25 needs decomposes into per-batch MERGEABLE pieces:
  *
  *  - postings (doc_id, dl, term, tf): one explode + one keyed agg
  *    over the BATCH only — docs never re-enter, so segments append
  *    with no merge at all;
  *  - per-term document frequency: the batch's (term, batch_df) rows
  *    appended as a segment — df(term) = Σ segments, summed lazily at
  *    query time over the broadcast-sized term domain instead of
  *    rewriting an O(vocabulary) store per batch;
  *  - corpus totals (n_docs, total token length): one appended row
  *    per batch, summed at query time.
  *
  * Per-batch cost is O(|batch| tokens) scoring plus metadata-only
  * unions — the same log-structured shape as the other streaming
  * stores, with [[consolidate]] collapsing the segment logs on a
  * schedule. [[query]] derives (tf, df, stats) from the maintained
  * state and hands them to [[Retrieval.bm25Score]] — the SAME scoring
  * expressions the batch operator runs, so ranked results (scores
  * included) are bit-identical to `bm25TopK` over the final corpus;
  * StreamIndexSpec pins it after every batch. At table scale the
  * postings store is range-laid-out by term
  * ([[graft.operators.Layout.writeRangeLayout]]) so a query's term
  * filter prunes to its posting files.
  */
object StreamIndex {

  /** Append-only segment stores: postings, per-batch term dfs, and
    * per-batch corpus totals.
    */
  final case class IndexState(postings: DataFrame, termDf: DataFrame,
                              totals: DataFrame)

  def emptyState(spark: org.apache.spark.sql.SparkSession): IndexState = {
    import spark.implicits._
    IndexState(
      Seq.empty[(Long, Int, String, Long)].toDF("doc_id", "dl", "term", "tf"),
      Seq.empty[(String, Long)].toDF("term", "df"),
      Seq.empty[(Long, Long)].toDF("n_docs", "total_len"))
  }

  /** Fold one micro-batch of (doc_id, text) rows into the index. */
  def ingest(state: IndexState, batch: DataFrame): IndexState = {
    val tokenized = batch.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
    val postings = tokenized
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    // batch df: distinct docs per term — postings already hold one
    // row per (doc, term), so this is a count over the batch segment
    val df = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    val tot = tokenized.agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("total_len"))
      .localCheckpoint(true)
    IndexState(
      state.postings.unionAll(postings),
      state.termDf.unionAll(df),
      state.totals.unionAll(tot))
  }

  /** BM25 top-k over the maintained index — same scoring tail as the
    * batch operator ([[Retrieval.bm25Score]]).
    */
  def query(state: IndexState, terms: Seq[String], k: Int = 20): DataFrame = {
    val tf = state.postings.filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl").cast("double").as("dl"),
        col("term"), col("tf").cast("double").as("tf"))
    val df = state.termDf.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(sum(col("df")).cast("double").as("df"))
    val stats = state.totals.agg(
      sum(col("n_docs")).cast("double").as("n_docs"),
      (sum(col("total_len")).cast("double") /
        sum(col("n_docs")).cast("double")).as("avgdl"))
    Retrieval.bm25Score(tf, df, stats, terms, k)
  }

  /** Collapse the three segment logs: postings to one checkpointed
    * segment, term dfs to one summed row per term, totals to one row
    * — scheduled compaction, amortized like the other streaming
    * stores' housekeeping.
    */
  def consolidate(state: IndexState): IndexState =
    IndexState(
      state.postings.localCheckpoint(true),
      state.termDf.groupBy("term").agg(sum(col("df")).as("df"))
        .localCheckpoint(true),
      state.totals.agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_len")).as("total_len")).localCheckpoint(true))

  /** Persist the maintained lexical store as parquet (postings +
    * per-term df + corpus totals) — the BM25 twin of
    * [[StreamAnn.save]]: a restart serves and keeps ingesting without
    * re-tokenizing the corpus. Counts are exact longs, so [[load]]
    * restores bit-identical state (StreamIndexSpec pins query
    * equality and post-load ingest).
    */
  def save(state: IndexState, dir: String): Unit = {
    state.postings.write.mode("overwrite").parquet(s"$dir/postings")
    state.termDf.write.mode("overwrite").parquet(s"$dir/term_df")
    state.totals.write.mode("overwrite").parquet(s"$dir/totals")
  }

  /** Reload a [[save]]d store. */
  def load(spark: org.apache.spark.sql.SparkSession,
           dir: String): IndexState =
    IndexState(
      postings = spark.read.parquet(s"$dir/postings"),
      termDf = spark.read.parquet(s"$dir/term_df"),
      totals = spark.read.parquet(s"$dir/totals"))
}
