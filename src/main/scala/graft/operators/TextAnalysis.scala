package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  * Everything is per-row column algebra (whole-stage codegen, no
  * UDFs) or a single explode+groupBy, so each operator is one scan
  * with at most one shuffle on doc_id.
  */
object TextAnalysis {

  /** Per-language stopword marker sets for the n-gram/stopword
    * language heuristic. Deterministic tie-break: list order.
    */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "de", "para"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "du", "pour"))

  private def toks: Column = split(col("text"), " ")

  private def fan(df: DataFrame): DataFrame = graft.sources.Par.fan(df)

  private def countIn(words: Seq[String]): Column = {
    val list = words.map(w => s"'$w'").mkString(", ")
    size(expr(s"filter(split(text, ' '), t -> t IN ($list))"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (alpha runs / digit runs / single other chars).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    fan(docs).select(col("doc_id"),
      size(toks).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_re_tokens"),
      length(col("text")).cast("long").as("n_chars_obs"))

  /** Quality scoring: token count, stopword ratio, mean token length,
    * composite score in [0,1]. All ratios are int/int or int/double
    * divisions — bit-identical across engines.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nTok = size(toks).cast(DoubleType)
    val nStop = countIn(StopWords.head._2).cast(DoubleType)
    val meanLen =
      length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / nTok
    val stopRatio = nStop / nTok
    val score =
      lit(0.3) * least(lit(1.0), nTok / lit(100.0)) +
      lit(0.4) * (lit(1.0) - stopRatio) +
      lit(0.3) * least(lit(1.0), meanLen / lit(8.0))
    fan(docs).select(col("doc_id"), nTok.as("n_tokens"),
      stopRatio.as("stopword_ratio"), meanLen.as("mean_token_len"),
      score.as("quality"))
  }

  /** Stopword-count language heuristic: argmax over per-language
    * marker hits, ties resolved by StopWords order.
    */
  def langId(docs: DataFrame): DataFrame = {
    val counted = StopWords.foldLeft(fan(docs)) { case (df, (lang, words)) =>
      df.withColumn(s"c_$lang", countIn(words))
    }
    val langs = StopWords.map(_._1)
    // lang i wins if its count >= every later lang's count (scan in order)
    val pred = langs.init.zipWithIndex.foldRight(
      lit(langs.last): Column) { case ((lang, i), onElse) =>
      val beats = langs.drop(i + 1)
        .map(o => col(s"c_$lang") >= col(s"c_$o")).reduce(_ && _)
      when(beats, lang).otherwise(onElse)
    }
    counted.select(col("doc_id"), pred.as("predicted_lang"),
      col("lang").as("labeled_lang"))
  }

  /** Document fingerprint: min md5 over all 8-char rolling windows
    * (winnowing-style content fingerprint, rolling-hash analog).
    */
  def fingerprint(docs: DataFrame, k: Int = 8): DataFrame =
    fan(docs)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          greatest(length(col("text")) - (k - 1), lit(1)))).as("i"))
      .select(col("doc_id"),
        md5(expr(s"substr(text, i, $k)")).as("h"))
      .groupBy("doc_id").agg(min(col("h")).as("fingerprint"))
}
