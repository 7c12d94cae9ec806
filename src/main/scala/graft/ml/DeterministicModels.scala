package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic analogs of the reference's learned model families
  * (services/ml-models/src/models/model_manager.py:279-307 dispatches
  * xgboost / lstm / bert / gnn / isolation_forest). The reference's
  * learned members return nondeterministic dummy outputs; these
  * analogs are frozen decision structures — a small tree ensemble
  * (the xgboost/random-forest analog) and an isolation-depth anomaly
  * score (the isolation-forest analog) — expressed in a tiny dual-
  * rendered DSL: every tree renders BOTH as a Catalyst `when` chain
  * and as DuckDB CASE SQL, so the scores are engine-identical by
  * construction (all leaf math is rational: sums of exact-decimal
  * leaves divided by a small integer — no libm anywhere).
  *
  * DIALECT WARNING: `Pred.sql` / `renderSql` / `treeEnsembleSql` /
  * `isolationScoreSql` emit **DuckDB-dialect SQL only**, for the
  * oracle. They are NOT safe to run through `spark.sql`:
  * `IsWeekend` renders `dayofweek(ts) IN (0, 6)`, correct under
  * DuckDB's 0=Sunday..6=Saturday numbering but silently meaning
  * Friday+Saturday under Spark's 1=Sunday..7=Saturday; `RoundAmount`
  * renders `fmod(...)`, which Spark lacks (that one at least fails
  * loudly). "Engine-identical" means the *Catalyst rendering* and the
  * *DuckDB rendering* of the same tree agree — not that the SQL
  * string is portable across SQL engines.
  *
  * Splits test only reproducible event columns (amount = `value`,
  * time-of-day / weekday of `ts`), matching the feature families the
  * reference's models consume (feature_engineering.py amount/time
  * blocks).
  */
object DeterministicModels {

  /** Split predicate, rendered for both engines. `amountSql`/`tsSql`
    * name the physical columns in the oracle's table.
    */
  sealed trait Pred {
    def col(amount: Column, ts: Column): Column
    def duckdbSql(amountSql: String, tsSql: String): String
  }
  final case class AmountGt(x: Double) extends Pred {
    def col(a: Column, t: Column): Column = a > lit(x)
    def duckdbSql(a: String, t: String): String = s"$a > CAST($x AS DOUBLE)"
  }
  final case class AmountLt(x: Double) extends Pred {
    def col(a: Column, t: Column): Column = a < lit(x)
    def duckdbSql(a: String, t: String): String = s"$a < CAST($x AS DOUBLE)"
  }
  case object IsNight extends Pred {
    def col(a: Column, t: Column): Column =
      graft.functions.Features.isNight(t)
    def duckdbSql(a: String, t: String): String =
      s"(hour($t) <= 6 OR hour($t) >= 22)"
  }
  case object IsWeekend extends Pred {
    // Spark dayofweek: 1=Sunday..7=Saturday; DuckDB: 0=Sunday..6
    def col(a: Column, t: Column): Column =
      graft.functions.Features.isWeekend(t)
    def duckdbSql(a: String, t: String): String = s"dayofweek($t) IN (0, 6)"
  }
  final case class RoundAmount(modulus: Double) extends Pred {
    def col(a: Column, t: Column): Column =
      graft.functions.Features.isRoundAmount(a, modulus)
    def duckdbSql(a: String, t: String): String =
      s"fmod($a, CAST($modulus AS DOUBLE)) = CAST(0.0 AS DOUBLE)"
  }

  sealed trait Node
  final case class Leaf(value: Double) extends Node
  final case class Split(pred: Pred, yes: Node, no: Node) extends Node

  def render(n: Node, amount: Column, ts: Column): Column = n match {
    case Leaf(v) => lit(v)
    case Split(p, y, nn) =>
      when(p.col(amount, ts), render(y, amount, ts))
        .otherwise(render(nn, amount, ts))
  }

  def renderDuckdbSql(n: Node, amountSql: String, tsSql: String): String =
    n match {
      case Leaf(v) => s"CAST($v AS DOUBLE)"
      case Split(p, y, nn) =>
        s"(CASE WHEN ${p.duckdbSql(amountSql, tsSql)} " +
          s"THEN ${renderDuckdbSql(y, amountSql, tsSql)} " +
          s"ELSE ${renderDuckdbSql(nn, amountSql, tsSql)} END)"
    }

  // ---- tree ensemble (xgboost analog): 3 frozen depth-2 trees,
  //      leaf probabilities averaged ----

  val FraudTrees: Seq[Node] = Seq(
    Split(AmountGt(1500.0),
      Split(IsNight, Leaf(0.9), Leaf(0.7)),
      Split(AmountLt(3.0), Leaf(0.6), Leaf(0.1))),
    Split(IsWeekend,
      Split(AmountGt(800.0), Leaf(0.65), Leaf(0.3)),
      Split(AmountGt(1200.0), Leaf(0.55), Leaf(0.05))),
    Split(IsNight,
      Split(AmountGt(500.0), Leaf(0.75), Leaf(0.35)),
      Split(RoundAmount(10.0), Leaf(0.45), Leaf(0.15))))

  /** Mean leaf probability across [[FraudTrees]] — exact rational. */
  def treeEnsembleScore(amount: Column, ts: Column): Column =
    FraudTrees.map(render(_, amount, ts)).reduce(_ + _) /
      lit(FraudTrees.size.toDouble)

  def treeEnsembleDuckdbSql(amountSql: String, tsSql: String): String =
    FraudTrees.map(renderDuckdbSql(_, amountSql, tsSql)).mkString("(", " + ", ")") +
      s" / CAST(${FraudTrees.size}.0 AS DOUBLE)"

  // ---- isolation forest analog: fixed axis-aligned isolation trees;
  //      a row's LEAF DEPTH is the split count until it isolates;
  //      anomalous rows isolate early (small depth) ----

  val IsoMaxDepth = 4

  val IsoTrees: Seq[Node] = Seq(
    // amount axis: extreme amounts isolate in 1-2 splits
    Split(AmountGt(1800.0), Leaf(1),
      Split(AmountGt(1500.0), Leaf(2),
        Split(AmountLt(2.0), Leaf(2), Leaf(4)))),
    // time×amount axis: rare night/large combinations isolate early
    Split(IsNight,
      Split(AmountGt(1000.0), Leaf(1), Leaf(3)),
      Split(AmountGt(1700.0), Leaf(2), Leaf(4))))

  /** Anomaly score in [0,1]: s = (Σ maxDepth − Σ depth) / (Σ maxDepth
    * − nTrees) — the rational monotone twin of the classic
    * 2^(−E[h]/c) (avoiding libm pow keeps it bit-exact cross-engine).
    * Depth 1 in every tree ⇒ 1.0; full depth everywhere ⇒ 0.0.
    */
  def isolationScore(amount: Column, ts: Column): Column = {
    val sumDepth = IsoTrees.map(render(_, amount, ts)).reduce(_ + _)
    val maxSum = IsoMaxDepth.toDouble * IsoTrees.size
    (lit(maxSum) - sumDepth) / lit(maxSum - IsoTrees.size)
  }

  def isolationScoreDuckdbSql(amountSql: String, tsSql: String): String = {
    val sumDepth = IsoTrees.map(renderDuckdbSql(_, amountSql, tsSql))
      .mkString("(", " + ", ")")
    val maxSum = IsoMaxDepth.toDouble * IsoTrees.size
    s"(CAST($maxSum AS DOUBLE) - $sumDepth) " +
      s"/ CAST(${maxSum - IsoTrees.size} AS DOUBLE)"
  }

  // ---- sequence model (lstm analog): the recurrent state collapses
  //      to a bounded look-back over the keyed, time-ordered event
  //      sequence — a 5-event recent-amount average, exact via the
  //      scaled-BIGINT windowed sum, normalized into a score ----

  /** Requires `user_id` and `event_id` columns (the sequence key and
    * the deterministic tiebreak). One keyed window pass — the same
    * shuffle shape a real sequence-feature extractor has at scale.
    */
  def sequenceScore(df: org.apache.spark.sql.DataFrame, amount: Column,
                    ts: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(ts, col("event_id")).rowsBetween(-4, 0)
    val exactSum = sum(round(amount * lit(1.0e4)).cast("long")).over(w)
      .cast("double") / lit(1.0e4)
    df.withColumn("n_recent", count(lit(1)).over(w))
      .withColumn("avg_recent", exactSum / col("n_recent"))
      .withColumn("p_fraud", graft.operators.Decisions.clamp01(
        col("avg_recent") / lit(1000.0)))
  }

  // ---- graph model (gnn analog): the learned aggregation collapses
  //      to the bipartite degree centrality the reference's GNN
  //      feature prep computes (graph_neural_network.py:338-392) ----

  /** Requires `user_id` and `event_id` (merchant key derived as in
    * Joins.degreeFeatures). One distinct-aggregate + a keyed join
    * back — no pair explosion.
    */
  def graphScore(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val mk = pmod(col("event_id") * lit(7), lit(97L))
    val deg = df.select(col("user_id"), mk.as("mk"))
      .groupBy("user_id")
      .agg(countDistinct(col("mk")).as("merchant_degree"))
    df.join(deg, "user_id").withColumn("p_fraud",
      least(col("merchant_degree").cast("double") / lit(10.0), lit(1.0)))
  }
}
