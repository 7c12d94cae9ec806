package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming incremental dedup — the continuous-ingest face of
  * [[graft.operators.Dedup.incrementalDedup]], covering BOTH of its
  * stages: the exact-hash semi-join (already twinned) and the
  * MinHash-LSH band-key probe against the standing corpus.
  *
  * == Shape ==
  * The corpus is distilled ONCE (batch side, [[exactIndex]] /
  * [[bandIndex]]) into two static probe structures; each micro-batch
  * is then classified with stream-static LEFT joins only:
  *
  *   - signatures are computed ROW-LOCALLY (higher-order array
  *     functions over the in-row shingle array), not by the batch
  *     operator's explode+groupBy — a micro-batch document fits in a
  *     row, and row-local hashing keeps the streaming query free of
  *     aggregations;
  *   - each of the `bands` band keys becomes its own column and its
  *     own equi-join against the band index (filtered to that band),
  *     instead of an explode + per-doc aggregation. With `bands` a
  *     small constant this is the same join volume, but the query
  *     stays STATELESS: append output mode, no watermark, no per-doc
  *     aggregation state accumulating across batches — per-batch cost
  *     is O(|batch| · bands) probes and nothing lingers.
  *
  * At scale the indexes are the big side: partition/bucket the band
  * index by (band, bkey) so each per-band join prunes to one
  * partition family, and let AQE broadcast whichever side is small.
  *
  * == Documented divergence from the batch operator ==
  * `incrementalDedup` computes its document-frequency cap over
  * batch ∪ corpus in one pass; a stream cannot see corpus-wide df,
  * so here the cap is baked into the CORPUS index at build time and
  * the (small) micro-batch side is uncapped. Results are identical
  * whenever no shingle crosses the cap (StreamingSpec pins
  * single-batch parity on such data); under a tripped cap the
  * streaming side errs toward extra candidates, never misses.
  */
object StreamDedup {

  /** Static exact-dup probe: distinct md5 of every corpus text. */
  def exactIndex(corpus: DataFrame): DataFrame =
    corpus.select(md5(col("text")).as("eh")).distinct()

  /** Static near-dup probe: distinct (band, bkey) LSH buckets of the
    * corpus MinHash signatures — built by the SAME batch code the
    * global and incremental operators use, so stream and batch agree
    * bucket-for-bucket. The shingle width `n` is threaded into the
    * batch signature builder: the stream side ([[dedupStream]]) MUST
    * be called with the same `n`, and since both sides now take the
    * parameter explicitly a mismatch is a visible call-site bug, not
    * a silent every-doc-is-"new" misclassification (the round-7
    * ADVICE finding: bandIndex hardcoded 3-gram shingles while
    * dedupStream accepted any n).
    */
  def bandIndex(corpus: DataFrame, numHashes: Int = 8, bands: Int = 2,
                maxDocFreq: Long = 1000, n: Int = 3): DataFrame =
    Dedup.bandKeys(Dedup.minhashSignatures(corpus, numHashes, maxDocFreq, n),
        numHashes, bands)
      .select("band", "bkey").distinct()

  /** Row-local MinHash band keys: h_j = min over shingles of
    * md5("j:"+sh), band key = md5(h-slice joined with "|") — the
    * byte-identical row-local form of the batch signature pipeline
    * (explode+groupBy min ≡ array_min over the in-row distinct
    * shingle array).
    */
  private def withBandKeys(docs: DataFrame, numHashes: Int, bands: Int,
                           n: Int): DataFrame = {
    val rows = numHashes / bands
    val gram = when(size(col("toks")) >= n,
      expr(s"""transform(sequence(1, size(toks) - ${n - 1}),
              |  i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(toks, i + $j)").mkString(", ")}))"""
        .stripMargin)).otherwise(array().cast("array<string>"))
    val sigCols: Seq[Column] = (0 until numHashes).map { j =>
      array_min(transform(col("shs"),
        sh => md5(concat(lit(s"$j:"), sh)))).as(s"h$j")
    }
    val sigs = docs
      .select(col("doc_id"), md5(col("text")).as("ehash"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("ehash"), array_distinct(gram).as("shs"))
      .select(col("doc_id") +: col("ehash") +: sigCols: _*)
    // a doc too short to shingle has null minima; its band keys stay
    // null (join-inert) instead of md5("") colliding with each other
    val bandCols = (0 until bands).map { b =>
      when(col("h0").isNotNull,
        md5(concat_ws("|", (b * rows until (b + 1) * rows)
          .map(r => col(s"h$r")): _*))).as(s"bkey_$b")
    }
    sigs.select(col("doc_id") +: col("ehash") +: bandCols: _*)
  }

  /** Classify a stream of (doc_id, text) against the standing corpus:
    * `dup_exact` | `dup_near` | `new`, one row per input doc, append
    * mode, stateless. `exactIdx` / `bandIdx` come from [[exactIndex]]
    * / [[bandIndex]] over the corpus (static DataFrames).
    */
  def dedupStream(stream: DataFrame, exactIdx: DataFrame,
                  bandIdx: DataFrame, numHashes: Int = 8, bands: Int = 2,
                  n: Int = 3): DataFrame = {
    val keyed = withBandKeys(stream, numHashes, bands, n)
      .join(exactIdx.withColumn("exact_hit", lit(1)),
        col("ehash") === col("eh"), "left")
    val probed = (0 until bands).foldLeft(keyed) { (acc, b) =>
      acc.join(bandIdx.filter(col("band") === b)
          .select(col("bkey").as(s"in_$b"), lit(1).as(s"near_$b")),
        col(s"bkey_$b") === col(s"in_$b"), "left")
    }
    val anyNear = (0 until bands).map(b => col(s"near_$b") === 1)
      .reduce(_ || _)
    probed.select(col("doc_id"),
      when(col("exact_hit") === 1, "dup_exact")
        .when(anyNear, "dup_near")
        .otherwise("new").as("status"))
  }
}
