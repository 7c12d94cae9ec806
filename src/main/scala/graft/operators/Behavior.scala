package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg

/** Behavioral / temporal analytics over the event stream — the
  * cohort, sequence, and attribution views a fraud or growth team
  * reads daily (reference surface: the dashboard aggregations in
  * services/analytics-dashboard/src/App.tsx:88-214, which the
  * reference computes client-side over API snapshots; here they are
  * engine operators).
  *
  * Scale notes (100 TB): every operator below is one keyed shuffle
  * over the events — per-user windows or a user-keyed aggregate —
  * followed by aggregation onto frames bounded by |cohorts×weeks|,
  * |event types|², or |channels|². Nothing retains per-event state
  * beyond its partition, and every second-pass join is against a
  * broadcast-sized frame.
  */
object Behavior {

  private val week = (c: Column) => date_trunc("week", c)

  /** Weekly cohort retention matrix: users are assigned to the week
    * of their first event (trunc is monotone, so
    * `date_trunc(min(ts))` ≡ `min(date_trunc(ts))` — one agg, not
    * two); activity is the DISTINCT (user, week) set; the matrix
    * counts per (cohort_week, week_offset) with the rate against the
    * cohort's size. Offsets divide by 7 exactly — both sides are
    * truncated Mondays, so the day difference is always a multiple
    * of 7 and the double division is IEEE-exact.
    *
    * Shuffles: one per-user agg, one (user, week) distinct, one
    * user-keyed join (co-partitioned at scale), final agg onto a
    * |cohorts×offsets| frame; cohort sizes are a |cohorts|-row
    * broadcast.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(week(min(col("ts"))).as("cohort_week"))
    val sizes = firstSeen.groupBy(col("cohort_week").as("sw"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = events
      .select(col("user_id"), week(col("ts")).as("activity_week"))
      .distinct()
    active.join(firstSeen, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / lit(7))
          .cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), col("cohort_week") === col("sw"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: LEAD over (user_id, ts, event_id) — event_id breaks
    * timestamp ties so the successor is total-ordered and
    * engine-independent — then transition counts and the row-
    * normalized probability (int/int single division, exact).
    *
    * The window is PARTITIONed by user: per-user state only, one
    * keyed shuffle; output is |types|² rows with the |types|-row
    * totals frame broadcast back.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type").as("ft"))
      .agg(sum(col("n")).as("row_total"))
    trans.join(broadcast(totals), col("from_type") === col("ft"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("row_total")).as("p"))
  }

  /** Top event paths per 30-minute session — the path-analysis view
    * behind every "how do users reach purchase" question: events
    * sessionize by the lag-gap trick (a row opens a session when the
    * gap to its predecessor exceeds `gapMinutes`; running sum of
    * openers = session id), each session renders its ordered
    * event-type path, and the top-K paths rank by frequency.
    * Ordering inside a path is (ts, event_id) — totally ordered, so
    * the collected path string is engine-independent. Gap seconds
    * compare as integers (timestamp cast truncates µs in Spark; the
    * oracle floor-divides epoch_us).
    *
    * Scale: one per-user window pass (keyed shuffle), one
    * (user, session) agg whose collect_list is bounded by session
    * length — a 30-minute human session is tens of events, not
    * data-scale — then a path-keyed count and a distributed
    * TakeOrdered top-K. No global sort of the data.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
                   topK: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sec = col("ts").cast("long")
    val gap = sec - lag(sec, 1).over(w)
    val opens = when(gap.isNull || gap > lit(gapMinutes * 60L), 1L)
      .otherwise(0L)
    val sid = sum(opens)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    events.withColumn("sid", sid)
      .groupBy(col("user_id"), col("sid"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))),
        x => x("event_type"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(topK)
  }

  /** Touch attribution: each purchase credits the LAST and the FIRST
    * preceding marketing touch (view / click / signup) of that user
    * — the two bookend models of multi-touch attribution. Purchases
    * with no prior touch attribute to 'direct'. Exact revenue via
    * [[ExactAgg.dsum]].
    *
    * One per-user window (rows UNBOUNDED PRECEDING .. 1 PRECEDING,
    * ignoreNulls last/first) — a single keyed shuffle carrying
    * per-partition sequential state; the grouped output is at most
    * |channels|² rows.
    */
  def attribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(
      col("event_type").isin("view", "click", "signup"), col("event_type"))
    events
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(
        coalesce(col("last_touch"), lit("direct")).as("last_touch"),
        coalesce(col("first_touch"), lit("direct")).as("first_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        ExactAgg.dsum(col("value")).as("revenue"))
  }
}
