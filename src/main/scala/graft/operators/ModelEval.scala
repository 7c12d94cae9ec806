package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg

/** Model-evaluation and weak-supervision operators over the embedding
  * corpus — the offline half of the reference's model lifecycle
  * (services/ml-models/src/testing/ab_testing.py evaluates variants
  * online; model_manager.py:78-130 tracks per-model accuracy): label
  * propagation for bootstrapping training labels, calibration
  * reliability bins, and precision/recall at decision thresholds.
  *
  * Exactness playbook as everywhere else: counts are int64, ratios
  * are single int/int double divisions (correctly rounded in any
  * engine), score sums go through [[ExactAgg]] scaled-BIGINT, and the
  * deterministic scorer reuses the embedding coordinates cast to
  * double with the same IEEE expression shape the oracle SQL uses.
  */
object ModelEval {

  /** kNN LABEL PROPAGATION (weak supervision): each query vector takes
    * the majority label of its k nearest neighbors. Neighbor search is
    * [[Similarity.ivfTopK]] — the bounded-candidate IVF path, NOT the
    * Θ(N²) brute-force scan — so the operator survives a cluster-size
    * corpus: candidates per query ≈ N·nprobe/nlist, the corpus itself
    * never shuffles beyond its one-time list assignment. Majority is
    * deterministic: votes desc, then smaller label. The label join is
    * a plain keyed join of k·|queries| vote rows against the (id,
    * label) projection — never the vectors.
    */
  def knnLabel(embeddings: DataFrame, queryPred: Column, k: Int = 5,
               nlist: Int = 16, nprobe: Int = 4,
               dim: Int = Similarity.Dim): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nn = Similarity.ivfTopK(embeddings, queryPred, k, nlist, nprobe, dim)
    val labels = embeddings.select(col("vec_id").as("neighbor_id"),
      col("label"))
    val votes = nn.join(labels, "neighbor_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  /** Deterministic scorer for the evaluation queries: first embedding
    * coordinate mapped to [0,1] — (v₁+1)/2 clamped. Same expression
    * shape as the oracle SQL (cast-to-double, add, divide), so the
    * score is bit-identical across engines.
    */
  def detScore(emb: Column): Column = {
    val s = (element_at(emb, 1).cast("double") + lit(1.0)) / lit(2.0)
    least(greatest(s, lit(0.0)), lit(1.0))
  }

  /** CALIBRATION RELIABILITY BINS: scores bucketed into `bins`
    * equal-width bins; per bin the observed positive rate (label
    * parity as the deterministic binary target) vs the exact mean
    * score. One groupBy — partial aggregation does the heavy lifting;
    * output is `bins` rows regardless of corpus size.
    */
  def calibrationBins(embeddings: DataFrame, bins: Int = 10): DataFrame = {
    val score = detScore(col("embedding"))
    val positive = (col("label") % 2 === 0).cast("long")
    graft.sources.Par.fan(embeddings)
      .select(least(floor(score * lit(bins)), lit(bins - 1)).cast("int")
          .as("bin"),
        score.as("score"), positive.as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("positives"),
        (sum(col("pos")).cast("double") / count(lit(1))).as("pos_rate"),
        ExactAgg.davg(col("score"), 9).as("mean_score"))
  }

  /** PRECISION / RECALL at fixed decision thresholds: one pass over
    * the corpus per nothing — thresholds ride along as an exploded
    * literal array (|thresholds|× row fan-out of two small ints, not
    * of the vectors), then a single groupBy. All ratios are int/int.
    */
  def prAtThresholds(embeddings: DataFrame,
                     thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7))
      : DataFrame = {
    val score = detScore(col("embedding"))
    val positive = (col("label") % 2 === 0).cast("long")
    graft.sources.Par.fan(embeddings)
      .select(score.as("score"), positive.as("actual"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .withColumn("pred", (col("score") >= col("threshold")).cast("long"))
      .groupBy(col("threshold"))
      .agg(
        sum(col("pred") * col("actual")).as("tp"),
        sum(col("pred") * (lit(1L) - col("actual"))).as("fp"),
        sum((lit(1L) - col("pred")) * col("actual")).as("fn"),
        (sum(col("pred") * col("actual")).cast("double") /
          greatest(sum(col("pred")), lit(1L))).as("precision"),
        (sum(col("pred") * col("actual")).cast("double") /
          greatest(sum(col("actual")), lit(1L))).as("recall"))
  }

  /** Preference-pair mining — the chosen/rejected extraction behind
    * RLHF/DPO data prep: per group (the "prompt"), the best- and
    * worst-scoring members with their margin. Selection is two
    * opposing row_number windows over ONE keyed shuffle (same
    * partitioning, Spark plans both in a single exchange); the
    * opposite id tiebreaks guarantee a user whose scores all tie
    * still yields two DISTINCT rows, and single-row groups
    * self-pair and are dropped. No max_by/arg_max: their tie choice
    * is engine-unspecified; the window spelling is deterministic
    * everywhere.
    */
  def preferencePairs(events: DataFrame, key: String = "user_id",
                      score: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy(col(key))
      .orderBy(col(score).desc, col("event_id").desc)
    val ww = Window.partitionBy(col(key))
      .orderBy(col(score).asc, col("event_id").asc)
    val r = events
      .withColumn("rb", row_number().over(wb))
      .withColumn("rw", row_number().over(ww))
    val best = r.filter(col("rb") === 1).select(col(key),
      col("event_id").as("best_event"), col(score).as("best_value"))
    val worst = r.filter(col("rw") === 1).select(col(key),
      col("event_id").as("worst_event"), col(score).as("worst_value"))
    best.join(worst, key)
      .filter(col("best_event") =!= col("worst_event"))
      .withColumn("margin", col("best_value") - col("worst_value"))
  }
}
