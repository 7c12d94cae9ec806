package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.ExactAgg._

/** Feature-engineering operators for the training-data pipeline:
  * normalization, correlation, decayed aggregates, discretization,
  * deterministic sampling, and the hashing trick. The reference
  * engineers its model features per event in Python
  * (services/feature-engineering/...); here each transform is column
  * algebra over the whole table — one scan, keyed shuffles only, and
  * every float is oracle-exact (scaled-BIGINT sums, fixed-order
  * chains, md5-derived randomness — see ExactAgg / the oracle twins).
  */
object FeatureEng {

  /** Per-group z-score normalization: z = (x − μ)/σ with the exact
    * mean and the exact-shape population stddev. The stats frame is a
    * broadcast (|groups| rows), so normalization adds NO shuffle on
    * the fact side — the same plan as the enrichment joins.
    * Zero-variance groups yield NULL z (no division by zero).
    */
  def zscoreNormalize(events: DataFrame): DataFrame = {
    val stats = events.groupBy("event_type").agg(
      davg(col("value")).as("mu"), dstd(col("value")).as("sigma"))
    graft.sources.Par.fan(events).join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("sigma") > 0.0,
          (col("value") - col("mu")) / col("sigma")).as("z"))
  }

  /** Pearson correlation of amount vs hour-of-day per event type —
    * the feature-selection screen. r = (Σxy/n − x̄·ȳ)/(σx·σy) with
    * every Σ an exact scaled-BIGINT sum and both σ the exact-shape
    * dstd, so r is bit-identical across engines without rounding.
    * Degenerate groups (either σ = 0) yield NULL.
    */
  def featureCorrelation(events: DataFrame): DataFrame = {
    val x = col("value")
    val y = hour(col("ts"))
    val n = count(lit(1)).cast(DoubleType)
    val cov = dsum(x * y, 0) / n - (dsum(x) / n) * (dsum(y) / n)
    val sx = dstd(x)
    val sy = dstd(y)
    events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      when(sx > 0.0 && sy > 0.0, cov / (sx * sy)).as("corr_value_hour"))
  }

  /** Exponentially-weighted moving average with α = 1/2 over each
    * user's event sequence: ewma = Σ_{k=0..9} x_{t−k} / 2^k (10-term
    * look-back; weight below 1/512 is noise). α = 1/2 on purpose:
    * every weight is a power of two, so each term x/2^k is EXACT in
    * IEEE arithmetic (exponent shift only) and the fixed left-to-right
    * sum is bit-identical across engines — a decayed-velocity feature
    * with zero float drift. One keyed window pass, the same exchange
    * as the sequence model.
    */
  def ewmaAmounts(events: DataFrame, terms: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val chain = (0 until terms).map { k =>
      val term = if (k == 0) col("value")
                 else coalesce(lag(col("value"), k).over(w), lit(0.0))
      term / lit(math.pow(2.0, k))
    }.reduce(_ + _)
    graft.sources.Par.fan(events)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        chain.as("ewma"))
  }

  /** Equi-depth discretization: NTILE(10) per event type over
    * (value, event_id) — the deterministic total order — rolled up to
    * per-bin boundaries and exact means. The window is KEYED (one
    * shuffle on event_type), not a global sort.
    */
  def quantileBins(events: DataFrame, bins: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events.withColumn("bin", ntile(bins).over(w))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"), davg(col("value")).as("avg_value"))
  }

  /** Deterministic stratified sampling: within each event type, rank
    * rows by md5 of a salted id (a uniform, engine-independent
    * permutation) and keep the first ⌊n/10⌋ — exactly 10% per stratum,
    * reproducible in any engine, no RNG state. The classic
    * training-subset draw (datasetSplit's per-ROW twin: that splits by
    * hash range, this draws an exact-size per-group sample).
    */
  def stratifiedSample(events: DataFrame, pctKeep: Int = 10): DataFrame = {
    val rk = Window.partitionBy(col("event_type"))
      .orderBy(md5(concat(lit("smp:"), col("event_id").cast("string"))),
        col("event_id"))
    val cnt = Window.partitionBy(col("event_type"))
    events
      .withColumn("rk", row_number().over(rk))
      .withColumn("n_stratum", count(lit(1)).over(cnt))
      .filter(col("rk") * lit(100L / pctKeep) <= col("n_stratum"))
      .select(col("event_id"), col("event_type"), col("rk"))
  }

  /** Feature-selection screen: mutual information AND chi-square
    * statistic between event type and the conversion flag
    * (value > 100), from one contingency pass. Cross-engine exactness:
    * every probability is an integer ratio; the only libm crossing
    * (ln) is rounded at 6dp BEFORE the product; and the cell sums are
    * made order-independent by quantizing each term to a BIGINT
    * (Σ over an unordered cell set would otherwise be
    * float-order-dependent). The statistic runs over the FULL
    * marginal grid — zero cells contribute their expected mass to
    * chi² (the classic observed-cells-only mistake halves chi² on a
    * perfect 2×2) and drop out of MI by the 0·ln 0 = 0 convention.
    */
  def featureSelection(events: DataFrame): DataFrame = {
    val conv = (col("value") > 100.0).cast("int")
    val cells = events.groupBy(col("event_type"), conv.as("conv"))
      .agg(count(lit(1)).as("n_ab"))
    val rowm = cells.groupBy("event_type").agg(sum("n_ab").as("n_a"))
    val colm = cells.groupBy("conv").agg(sum("n_ab").as("n_b"))
    val tot = cells.agg(sum("n_ab").as("n"))
    val j = broadcast(rowm).crossJoin(broadcast(colm))
      .crossJoin(broadcast(tot))
      .join(cells, Seq("event_type", "conv"), "left")
      .withColumn("n_ab", coalesce(col("n_ab"), lit(0L)))
    val p = col("n_ab").cast(DoubleType) / col("n")
    val lnArg = (col("n_ab") * col("n")).cast(DoubleType) /
      (col("n_a") * col("n_b")).cast(DoubleType)
    val miTerm = when(col("n_ab") > 0, p * round(log(lnArg), 6))
      .otherwise(lit(0.0))
    val e = (col("n_a") * col("n_b")).cast(DoubleType) / col("n")
    val dlt = col("n_ab").cast(DoubleType) - e
    val chiTerm = dlt * dlt / e
    j.agg(
      (sum(round(miTerm * 1.0e9).cast("long")).cast(DoubleType) / 1.0e9)
        .as("mi"),
      (sum(round(chiTerm * 1.0e6).cast("long")).cast(DoubleType) / 1.0e6)
        .as("chi2"),
      count(lit(1)).as("n_cells"))
  }

  /** Hashing-trick bag-of-words (Weinberger et al., ICML 2009): each
    * token hashes to one of `buckets` feature slots (first two md5
    * nibbles) with a ±1 sign (third nibble's high bit), summed per
    * document — a fixed-width feature vector in long form, no
    * vocabulary pass, one explode + one keyed aggregation. md5-derived
    * slots and signs reproduce exactly in the oracle.
    */
  /** Winsorization — clamp each value into its key's [p_lo, p_hi]
    * exact percentile band, the standard outlier-robust preprocessing
    * step before normalization/training. The per-key bounds frame is
    * |keys| rows and broadcasts; the clamp is row-local
    * greatest/least (pure selection, no arithmetic — bit-exact in any
    * engine given equal percentiles, which Spark `percentile` and
    * DuckDB `quantile_cont` guarantee via the shared
    * linear-interpolation definition).
    */
  def winsorize(events: DataFrame, lo: Double = 0.01,
                hi: Double = 0.99): DataFrame = {
    val bounds = events.groupBy(col("event_type").as("wt"))
      .agg(expr(s"percentile(value, $lo)").as("p_lo"),
        expr(s"percentile(value, $hi)").as("p_hi"))
    events.join(broadcast(bounds), col("event_type") === col("wt"))
      .select(col("event_id"), col("event_type"), col("value"),
        greatest(col("p_lo"), least(col("p_hi"), col("value")))
          .as("value_winsorized"),
        (col("value") < col("p_lo")).as("clipped_low"),
        (col("value") > col("p_hi")).as("clipped_high"))
  }

  /** Deterministic NEGATIVE SAMPLING — the contrastive-training prep
    * step: for every user, draw up to `k` items (event types) the user
    * has never interacted with, reproducibly (no RNG — every draw is
    * md5-derived, so the oracle mirrors it exactly).
    *
    * == Scale shape ==
    * Generation is a PER-USER DIRECT DRAW, never an enumeration of
    * users × vocabulary: each user explodes into exactly `draws`
    * candidate rows (`sequence(1, draws)`), and each draw maps to a
    * catalog item by hash — `md5(user, i)`'s first four nibbles form a
    * 16-bit integer taken mod |vocab| and joined to the item catalog
    * on its dense index. End-to-end volume is O(|users|·draws)
    * regardless of catalog size: with a 10⁶-item catalog and 10⁸
    * users this generates 10⁹·draws rows, not the 10¹⁴ of the
    * cross-join spelling (the round-4 form generated users × vocab
    * and filtered AFTER — bounded output, unbounded generation).
    *
    * The catalog index comes from [[Layout.globalIndex]] (two-phase
    * distributed rank — no single-partition window even for a huge
    * catalog), and |vocab| enters the modulus as a broadcast 1-row
    * frame so the whole plan stays lazy. Duplicate draws of the same
    * item collapse to their first draw position (groupBy min), then
    * positives are anti-joined out and the first `k` survivors by
    * draw order win. Semantics are "UP TO k": a user whose draws all
    * collide with positives yields fewer — the price of never
    * materializing the complement set, and the standard contract for
    * sampled negatives.
    *
    * The 16-bit index has a uniform-ish modulo bias (≤ 1 part in
    * 2¹⁶/|vocab|), irrelevant for sampling and identical in the
    * oracle's arithmetic.
    */
  def negativeSamples(interactions: DataFrame, userCol: String,
                      itemCol: String, k: Int = 2,
                      draws: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE distinct pass over the interactions feeds both projections —
    // without the cache, users/vocab/positives would each re-run the
    // (possibly joined) upstream
    val pos = OperatorCaches.track(
      interactions.select(userCol, itemCol).distinct())
    val users = pos.select(userCol).distinct()
    // dense 1-based catalog index, distributed two-phase rank
    val vocab = Layout.globalIndex(
      pos.select(itemCol).distinct(), Seq(itemCol), "vi")
    val vocabSize = vocab.agg(count(lit(1)).as("vsz"))
    val h = md5(concat(lit("negd:"), col(userCol).cast("string"),
      lit(":"), col("i").cast("string")))
    // 16-bit draw value from the digest's first four nibbles; mod
    // |vocab| (+1) lands on the dense catalog index. conv() parses
    // the four hex chars in ONE expression — the per-nibble
    // when-chain spelling inlines the md5 into every branch (no CSE
    // across conditional branches), measured ~20 µs/row vs ~nothing
    val draw16 = conv(substring(h, 1, 4), 16, 10).cast("long")
    // repartition BEFORE the explode: AQE coalesces the tiny
    // distinct-user frame to a couple of tasks and the fan-out then
    // runs nearly serial (measured in round 4 on the cross-join
    // form); hash-spreading users first keeps every stage parallel
    val candidates = users.repartition(col(userCol))
      .select(col(userCol),
        explode(sequence(lit(1), lit(draws))).as("i"))
      .crossJoin(broadcast(vocabSize)) // 1-row frame: |vocab| scalar
      .select(col(userCol), col("i"),
        (pmod(draw16, col("vsz")) + 1).as("vi"))
      // duplicate draws of one item keep their first draw position
      .groupBy(col(userCol), col("vi"))
      .agg(min(col("i")).as("draw_i"))
      .join(broadcast(vocab), "vi")
    val rank = row_number().over(Window.partitionBy(col(userCol))
      .orderBy(col("draw_i"), col(itemCol)))
    candidates
      .join(pos, Seq(userCol, itemCol), "left_anti")
      .withColumn("rnk", rank)
      .filter(col("rnk") <= k)
      .select(col(userCol), col(itemCol).as("neg_item"), col("rnk"))
  }

  def hashedFeatures(docs: DataFrame, buckets: Int = 64): DataFrame = {
    val tok = graft.sources.Par.fan(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bucket = pmod(
      Dedup.hexNibble(substring(col("h"), 1, 1)) * 16 +
        Dedup.hexNibble(substring(col("h"), 2, 1)), lit(buckets))
    val sign = when(substring(col("h"), 3, 1) >= "8", 1).otherwise(-1)
    tok.groupBy(col("doc_id"), bucket.as("bucket"))
      .agg(sum(sign).as("weight"))
  }

  /** fastText-style MODEL-BASED quality filter — the published
    * pipelines' second quality gate after the heuristic one (CCNet's
    * fastText LM filter, FineWeb-Edu's classifier): a linear scorer
    * over the hashing-trick bag-of-words. The model is a
    * deterministic analog per this repo's DeterministicModels policy:
    * per-bucket integer weights derived from md5("qw:" + bucket) in
    * [-50, 50], margin = Σ_buckets doc_weight(bucket) · w(bucket) in
    * exact int64 arithmetic (no libm — bit-identical across engines),
    * keep ⇔ margin ≥ threshold. A production drop-in replaces the
    * weight column with a broadcast frame of trained coefficients;
    * the plan shape is unchanged.
    *
    * Scale: the margin is ZERO-SHUFFLE and COMPILED — the native
    * [[graft.plans.HashedBagMargin]] kernel folds sign·weight over
    * the tokens in one pass per row (integer addition is order-free,
    * so the fold equals [[hashedFeatures]]' per-bucket grouping
    * exactly; FeatureEngSpec pins both against a hand computation).
    * The operator's first spelling rode hashedFeatures'
    * groupBy(doc_id, bucket) — an O(total tokens) keyed exchange,
    * measured as the dominant cost of the curation throughput
    * gauntlet; the kernel scores a corpus in the same single pass the
    * heuristic quality gate takes.
    */
  def qualityClassifier(docs: DataFrame, buckets: Int = 64,
                        threshold: Long = 0L): DataFrame =
    graft.sources.Par.fan(docs)
      .select(col("doc_id"),
        graft.plans.HashedBagMargin(col("text"), buckets).as("margin"))
      .select(col("doc_id"), col("margin"),
        (col("margin") >= threshold).as("keep"))

  /** Class-rebalancing downsample to the minority-class size: every
    * class keeps rows with probability min_count/count_c, decided by
    * a 16-bit md5 draw per row against the class's threshold via
    * INTEGER cross-multiplication (d16 · count_c < min_count · 2¹⁶) —
    * no FP in the keep decision, stable under reprocessing and row
    * order, no shuffle of the data itself (class counts and the
    * minimum broadcast back; the filter is row-local). The 16-bit
    * draw keeps the cross-product inside int64 up to ~10¹⁴-row
    * classes; granularity ±2⁻¹⁶ of the target rate.
    */
  def rebalanceClasses(df: DataFrame, cls: String = "event_type",
                       key: String = "event_id"): DataFrame = {
    val counts = df.groupBy(col(cls)).agg(count(lit(1)).as("cnt"))
    val minc = counts.agg(min(col("cnt")).as("minc"))
    val d16 = conv(substring(
      md5(concat(lit("bal:"), col(key).cast("string"))), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(counts), cls)
      .crossJoin(broadcast(minc))
      .filter(d16 * col("cnt") < col("minc") * lit(65536L))
  }

  /** Group-aware k-fold assignment profile — cross-validation folds
    * keyed by the GROUP (user), not the row, so no user's data
    * straddles folds (the group-leakage mistake row-hashed folds
    * make when rows within a user correlate). Fold = 16-bit md5 draw
    * of the user id mod k; the profile reports per-fold row/user
    * volume and the exact mean value, the balance audit run before
    * trusting a CV estimate. Row-local fold math, one partial+final
    * agg — nothing shuffles but the |k|-row profile.
    */
  def kfoldProfile(events: DataFrame, k: Int = 5): DataFrame = {
    val fold = pmod(conv(substring(
      md5(concat(lit("fold:"), col("user_id").cast("string"))), 1, 4), 16, 10)
      .cast("long"), lit(k.toLong))
    events.groupBy(fold.as("fold"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        davg(col("value")).as("avg_value"))
  }

  /** Equi-width value histogram per event type: bin = floor(v/width)
    * (FLOOR before any cast — DuckDB's double→BIGINT cast rounds
    * where Spark truncates, so the floor must happen in FP in both
    * engines). One partial+final agg; output is |types·bins| rows.
    */
  def valueHistogram(events: DataFrame, width: Double = 50.0): DataFrame =
    events.groupBy(col("event_type"),
        floor(col("value") / lit(width)).as("bin"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("bin_sum"))

  /** Oracle-facing profile of [[rebalanceClasses]]: per class the
    * original and kept counts with the achieved rate (int/int single
    * division, exact).
    */
  def rebalanceProfile(df: DataFrame, cls: String = "event_type",
                       key: String = "event_id"): DataFrame =
    rebalanceClasses(df, cls, key)
      .groupBy(col(cls)).agg(count(lit(1)).as("n_kept"),
        first(col("cnt")).as("n_before"))
      .select(col(cls), col("n_before"), col("n_kept"),
        (col("n_kept").cast(DoubleType) / col("n_before")).as("kept_rate"))
}
