package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg._

/** Batch forms of the reference's windowed aggregations
  * (reference: services/flink-jobs/.../windows/WindowProcessor.java:36-166).
  * The same groupBy(window(...)) shapes run unchanged under Structured
  * Streaming with a watermark (see graft.streaming); the batch forms
  * are the oracle-checkable surface.
  *
  * Scale notes: every aggregate here is partial+final (map-side
  * combine before the shuffle), distinct counts are exact for the
  * oracle but the library exposes approx variants for the 100 TB
  * path, and sliding windows fan each row out to window/slide panes
  * *after* projection so only the needed columns are replicated.
  */
object WindowedAggs {

  /** A1-style per-key velocity profile (count / sum / distinct kinds /
    * first / last) — WindowProcessor.java:248-352 without the window,
    * i.e. the whole-history roll-up the oracle can check.
    */
  def keyVelocity(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      dsum(col("value")).as("total_value"),
      countDistinct(col("event_type")).as("n_types"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"))

  /** A2-style per-merchant stats: count/sum/avg/stddev/distinct.
    * stddev here is the exact-reproducible two-sum form; the
    * reference keeps a full List<Double> to compute it
    * (WindowProcessor.java:383,439-457) — O(n) state the Spark form
    * never materializes.
    */
  def supplierStats(lineitem: DataFrame): DataFrame =
    // fan the scan (r17): the partial-agg pass (countDistinct expand +
    // the exact-sum rounding per row) ran in the file's 3 splits while
    // the box idled (measured: 1.55 s in a 3-task stage); fan is a
    // guarded no-op at cluster scan parallelism (Par.scala)
    graft.sources.Par.fan(lineitem).groupBy(col("l_suppkey")).agg(
      count(lit(1)).as("n_items"),
      dsum(col("l_quantity")).as("sum_qty"),
      davg(col("l_extendedprice")).as("avg_price"),
      dstd(col("l_extendedprice")).as("std_price"),
      countDistinct(col("l_partkey")).as("n_parts"))

  /** A9 hourly roll-up (epoch-hour bucketing,
    * RedisTransactionSink.java:140-262) via date_trunc.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("bucket_hour")).agg(
      count(lit(1)).as("n_events"),
      dsum(col("value")).as("total_value"),
      countDistinct(col("user_id")).as("n_users"))

  /** TPC-H Q1-shaped pricing summary: the canonical multi-aggregate
    * scan (batch OLAP parity for the generic oracle surface).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount"), scale = 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6-shaped revenue filter: tight scan with pushed-down
    * range predicates.
    */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1994-01-01 00:00:00")) &&
              col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n"))

  /** Set-operation surface: customers active early vs late in the
    * window (INTERSECT / EXCEPT parity).
    */
  def churnSets(events: DataFrame): DataFrame = {
    val mid = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    val early = events.filter(col("ts") < mid).select(col("user_id"))
    val late = events.filter(col("ts") >= mid).select(col("user_id"))
    val retained = early.intersect(late)
      .withColumn("cohort", lit("retained"))
    val churned = early.except(late).withColumn("cohort", lit("churned"))
    val appeared = late.except(early).withColumn("cohort", lit("new"))
    retained.unionAll(churned).unionAll(appeared)
      .groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
  }

  /** CUBE over (event_type, weekday-flag): all 4 grouping sets in one
    * pass — completes the grouping-sets surface next to ROLLUP.
    */
  def cubeStats(events: DataFrame): DataFrame =
    events
      .withColumn("on_weekend", dayofweek(col("ts")).isin(1, 7))
      .cube(col("event_type"), col("on_weekend"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))

  /** A9's daily + per-key-hour variants. */
  def dailyRollup(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("day", col("ts")).as("bucket_day")).agg(
      count(lit(1)).as("n_events"),
      dsum(col("value")).as("total_value"),
      countDistinct(col("user_id")).as("n_users"),
      count_if(col("event_type") === "error").as("n_errors"))

  /** A1's sliding window (5 min window / 1 min slide,
    * WindowProcessor.java:36-49): each event lands in 5 panes.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("total_value"))
      .select(col("window.start").as("pane_start"),
              col("n_events"), col("total_value"))

  /** A3 session windows (30-minute inactivity gap,
    * WindowProcessor.java:74-87) per user.
    */
  /** A9 third variant: per-merchant-per-hour roll-up
    * (RedisTransactionSink.java:222-262 `merchant:<id>:<hourKey>`
    * aggregation: count, amount sums/avg, flagged-event rate, unique
    * users). The merchant key is the simulator's deterministic
    * assignment (`m<id*7 mod 97>`, DataGen.transactions) derived from
    * the event id; `error` events play the fraud-flag role.
    */
  def merchantHourRollup(events: DataFrame): DataFrame = {
    val flagged = count(when(col("event_type") === "error", 1))
    events
      .groupBy(
        concat(lit("m"), pmod(col("event_id") * 7, lit(97L)).cast("string"))
          .as("merchant_id"),
        date_trunc("hour", col("ts")).as("bucket_hour"))
      .agg(
        count(lit(1)).as("total_count"),
        dsum(col("value")).as("total_amount"),
        davg(col("value")).as("avg_amount"),
        flagged.as("flag_count"),
        (flagged.cast("double") / count(lit(1)).cast("double"))
          .as("flag_rate"),
        countDistinct(col("user_id")).as("unique_user_count"))
  }

  /** PIVOT: per-user event-type counts as columns (the wide-format
    * feature matrix a model-training join consumes). Explicit value
    * list ⇒ single pass, no distinct-values pre-query; absent cells
    * filled 0 to match the conditional-count SQL form.
    */
  def eventTypePivot(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type",
        Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  def userSessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("total_value"),
           min(col("ts")).as("session_start"))
      .drop("session_window")

  /** Burst detection (Kleinberg-lite): per event type, an hour
    * bucket bursts when its count exceeds `factor`× the trailing
    * 24-hour PER-HOUR rate. The trailing sum comes from a keyed
    * RANGE window (24 PRECEDING .. 1 PRECEDING on the integer hour
    * bucket) — RANGE, not ROWS, so silent hours naturally contribute
    * zero without a densify — and the rate divides by the fixed 24,
    * making the flag the integer cross-multiplication
    * n·24 > factor·sum: no FP in the decision. `trail_cnt` (observed
    * buckets in the window) rides along as the sparsity audit. One
    * grouped count, one keyed window: two shuffles on |types·hours|
    * rows, never on the events.
    */
  def burstDetect(events: DataFrame, factor: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hb = (col("ts").cast("long") / lit(3600L)).cast("long")
    val hourly = events.groupBy(col("event_type"), hb.as("hour_bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("hour_bucket")).rangeBetween(-24, -1)
    hourly
      .withColumn("trail_sum", sum(col("n")).over(w))
      .withColumn("trail_cnt", count(col("n")).over(w))
      .filter(col("trail_cnt") > 0)
      .select(col("event_type"), col("hour_bucket"), col("n"),
        col("trail_sum"), col("trail_cnt"),
        (col("n") * lit(24L) > lit(factor) * col("trail_sum"))
          .as("burst"))
  }

  /** Hourly gap-fill + dormancy profile per user: densify each user's
    * [first, last] activity range to an hourly spine (sequence +
    * explode — rows exist for silent hours too, the resample shape),
    * left-join the real hourly counts, and measure the LONGEST silent
    * streak via the gaps-and-islands trick (hour index minus empty-row
    * rank is constant within a consecutive silent run). Dormancy gaps
    * are an account-takeover signal in the reference's feature set;
    * this is the batch resample form. All integer arithmetic: spine
    * hours, counts, and run lengths are exact in any engine.
    */
  def hourlyGapProfile(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val spine = events.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
           date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("h"))
    // Respread + share the spine join (r17): the exploded spine is
    // derived work ≫ its bytes, so AQE coalesced the join to ~1 task
    // (measured: 0.82 s single-task final stage), and the frame feeds
    // BOTH the empty-run scan and the per-user profile — uncached each
    // consumer re-ran spine+join. Repartitioning by user_id satisfies
    // the window AND both groupBys (no further exchange), same §8 move
    // as coOccurrenceDense.
    val width = math.max(
      events.sparkSession.sparkContext.defaultParallelism,
      events.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        .toInt)
    val joined = OperatorCaches.track(
      spine.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("hidx", (col("h").cast("long") / 3600).cast("long"))
        .withColumn("is_empty", col("n").isNull)
        .repartition(width, col("user_id")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hidx"))
    val runs = joined.filter(col("is_empty"))
      .withColumn("grp", col("hidx") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("user_id").agg(max(col("run")).as("max_empty_run"))
    joined.groupBy("user_id").agg(
        count(lit(1)).as("n_hours"),
        count(when(!col("is_empty"), 1)).as("n_active_hours"),
        count(when(col("is_empty"), 1)).as("n_empty_hours"))
      .join(runs, Seq("user_id"), "left")
      .withColumn("max_empty_run",
        coalesce(col("max_empty_run"), lit(0L)))
  }
}
