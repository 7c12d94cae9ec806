package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Hybrid serving over the MAINTAINED streaming indexes — the
  * continuous-ingest face of [[graft.operators.Retrieval.hybridRrf]]:
  * the lexical leg queries the incrementally-grown BM25 segments
  * ([[StreamIndex]], scores bit-identical to the batch operator by
  * shared `bm25Score`), the vector leg queries the frozen-codebook
  * IVF store ([[StreamAnn]], row-identical to `ivfTopK` by shared
  * assignment), and the fusion is [[Retrieval.rrfFuse]] VERBATIM — so
  * the streamed hybrid result equals the batch operator over the
  * final corpus by construction at every ingest point
  * (StreamServeSpec pins it across a build + two ingests on both
  * stores).
  */
object StreamServe {

  /** Reciprocal-rank fusion over the two maintained indexes. The
    * query is (terms, query-vector rows); `queries` must select the
    * single query vector the batch twin addresses by `queryVecId` —
    * [[Retrieval.rrfFuse]] drops the vector leg's query_id, so a
    * multi-vector frame would silently blend per-query rank lists
    * into garbage; the precondition is enforced, not documented
    * (the count is over the tiny query frame — one bounded job).
    */
  def hybridRrf(idx: StreamIndex.IndexState, ann: StreamAnn.AnnState,
                terms: Seq[String], queries: DataFrame, k: Int = 10,
                kLex: Int = 20, kVec: Int = 20, rrfK: Int = 60,
                nprobe: Int = 4): DataFrame = {
    val n = queries.limit(2).count()
    require(n == 1,
      s"hybridRrf fuses ONE query vector against one term list; " +
        s"got ${if (n == 0) "an empty" else "a multi-row"} query frame")
    Retrieval.rrfFuse(
      StreamIndex.query(idx, terms, kLex),
      StreamAnn.query(ann, queries, kVec, nprobe)
        .select(col("neighbor_id"), col("rn")),
      k, rrfK)
  }

  /** Hard-negative mining off the MAINTAINED vector index: the same
    * contrastive-training feed as
    * [[graft.operators.Similarity.hardNegatives]], but the shortlist
    * probe runs against the streaming [[StreamAnn.AnnState]] — newly
    * ingested vectors become mineable negatives without reindexing.
    * The label-filter + re-rank tail IS the batch operator's tail
    * (shared by construction), so with id-aligned stores the stream
    * result equals the batch result over the same corpus
    * (StreamServeSpec pins the equality).
    */
  def hardNegatives(ann: StreamAnn.AnnState, labels: DataFrame,
                    queries: DataFrame, k: Int = 5, pool: Int = 20,
                    nprobe: Int = 4): DataFrame = {
    require(k >= 1 && pool >= k, s"need pool >= k >= 1, got k=$k pool=$pool")
    graft.operators.Similarity.hardNegativesTail(
      StreamAnn.query(ann, queries, pool, nprobe)
        .select(col("query_id"), col("neighbor_id"), col("cos")),
      labels, k)
  }

  /** MMR-diversified serving off the MAINTAINED vector index: the
    * batch [[graft.operators.Similarity.mmrTopK]] greedy selection
    * (ONE shared tail — λ·rel − (1−λ)·max-sim over the bounded
    * shortlist, per-round lineage cuts included) with the shortlist
    * probe and the pairwise vectors both read from the streaming
    * [[StreamAnn.AnnState]]. StreamServeSpec pins stream ≡ batch
    * over the final corpus.
    */
  def mmrTopK(ann: StreamAnn.AnnState, queries: DataFrame, k: Int = 5,
              pool: Int = 20, lam: Double = 0.7,
              nprobe: Int = 4): DataFrame = {
    require(k >= 1 && pool >= k, s"need pool >= k >= 1, got k=$k pool=$pool")
    // cached like the batch twin's shortlist: mmrTail consumes the
    // shortlist ~k+1 times, and each uncached consumption would
    // re-run the whole index-wide probe
    graft.operators.Similarity.mmrTail(
      graft.operators.OperatorCaches.track(
        StreamAnn.query(ann, queries, pool, nprobe)
          .select(col("query_id"), col("neighbor_id"), col("cos").as("rel"))),
      ann.index.select(col("vec_id").as("neighbor_id"), col("v"),
        col("nrm")),
      k, lam, ann.dim)
  }
}
