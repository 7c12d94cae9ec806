package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval
import graft.streaming.{StreamAnn, StreamIndex, StreamServe}

class StreamServeSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
  private lazy val emb = graft.sources.Tables(spark, sf, "embeddings")

  test("streamed hybrid RRF equals the batch operator over the final corpus") {
    val terms = Seq("spark", "join", "window")
    // build both maintained stores from a seed, then grow them with
    // the same two id-aligned batches (doc_id ≡ vec_id — the corpus
    // convention hybridRrf documents)
    def docPart(m: Long) = col("doc_id") % 3 === m
    def vecPart(m: Long) = col("vec_id") % 3 === m
    // the ANN seed must hold the pivot vectors (vec_id < 16) so the
    // frozen codebook equals the batch twin's full-corpus derivation
    var ann = StreamAnn.build(
      emb.filter(vecPart(0) || col("vec_id") < 16))
    var idx = StreamIndex.ingest(StreamIndex.emptyState(spark),
      docs.filter(docPart(0) || col("doc_id") < 16))
    ann = StreamAnn.ingest(ann,
      emb.filter(vecPart(1) && col("vec_id") >= 16))
    idx = StreamIndex.ingest(idx,
      docs.filter(docPart(1) && col("doc_id") >= 16))
    ann = StreamAnn.ingest(ann,
      emb.filter(vecPart(2) && col("vec_id") >= 16))
    idx = StreamIndex.ingest(idx,
      docs.filter(docPart(2) && col("doc_id") >= 16))
    idx = StreamIndex.consolidate(idx)
    ann = StreamAnn.consolidate(ann)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getDouble(1),
       if (r.isNullAt(2)) -1 else r.getInt(2),
       if (r.isNullAt(3)) -1 else r.getInt(3), r.getInt(4))
    }.toSeq
    val got = key(StreamServe.hybridRrf(idx, ann, terms,
      emb.filter(col("vec_id") === 0L)))
    val want = key(Retrieval.hybridRrf(docs, emb, terms, queryVecId = 0L))
    assert(got == want)
    graft.operators.OperatorCaches.releaseAll()
  }

  test("streamed hard negatives equal the batch operator over the final corpus") {
    def vecPart(m: Long) = col("vec_id") % 3 === m
    var ann = StreamAnn.build(emb.filter(vecPart(0) || col("vec_id") < 16))
    ann = StreamAnn.ingest(ann, emb.filter(vecPart(1) && col("vec_id") >= 16))
    ann = StreamAnn.ingest(ann, emb.filter(vecPart(2) && col("vec_id") >= 16))
    ann = StreamAnn.consolidate(ann)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4))
    }.toSet
    val got = key(StreamServe.hardNegatives(ann,
      emb.select(col("vec_id"), col("label")),
      emb.filter(col("vec_id") < 8)))
    val want = key(graft.operators.Similarity.hardNegatives(
      emb, col("vec_id") < 8))
    assert(got == want)
    assert(got.nonEmpty)
    graft.operators.OperatorCaches.releaseAll()
  }

  test("streamed MMR equals the batch operator over the final corpus") {
    def vecPart(m: Long) = col("vec_id") % 3 === m
    var ann = StreamAnn.build(emb.filter(vecPart(0) || col("vec_id") < 16))
    ann = StreamAnn.ingest(ann, emb.filter(vecPart(1) && col("vec_id") >= 16))
    ann = StreamAnn.ingest(ann, emb.filter(vecPart(2) && col("vec_id") >= 16))
    ann = StreamAnn.consolidate(ann)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    }.toSet
    val got = key(StreamServe.mmrTopK(ann, emb.filter(col("vec_id") < 4)))
    val want = key(graft.operators.Similarity.mmrTopK(
      emb, col("vec_id") < 4))
    assert(got == want)
    assert(got.nonEmpty)
    graft.operators.OperatorCaches.releaseAll()
  }
}
