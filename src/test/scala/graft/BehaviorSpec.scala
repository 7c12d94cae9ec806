package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Joins, Quality}

/** Behavior pins for cohort retention, event transitions, touch
  * attribution, triangle counting, and the seasonal anomaly screen.
  */
class BehaviorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("cohortRetention: cohort = first-seen week, offsets in weeks") {
    // u1 first in week1 (Jan 1), active weeks 1+2; u2 week1 only;
    // u3 first in week2 (Jan 8), active weeks 2+3
    val e = Seq(
      (1L, ts(1)), (1L, ts(10)),
      (2L, ts(3)),
      (3L, ts(8)), (3L, ts(16))
    ).toDF("user_id", "ts").withColumn("event_id", monotonically_increasing_id())
    val out = Behavior.cohortRetention(e).collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(out == Set(
      ("2024-01-01 00:00:00.0", 0, 2L, 2L, 1.0),
      ("2024-01-01 00:00:00.0", 1, 2L, 1L, 0.5),
      ("2024-01-08 00:00:00.0", 0, 1L, 1L, 1.0),
      ("2024-01-08 00:00:00.0", 1, 1L, 1L, 1.0)))
  }

  test("eventTransitions: counts per ordered pair, id breaks ts ties") {
    val e = Seq(
      (1L, 10L, "view", ts(1, 1)),
      (1L, 11L, "click", ts(1, 2)),
      (1L, 12L, "purchase", ts(1, 3)),
      // u2: two events at the SAME ts — event_id orders them
      (2L, 20L, "view", ts(2, 1)),
      (2L, 21L, "click", ts(2, 1))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Behavior.eventTransitions(e).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("view", "click")) == (2L, 1.0))
    assert(out(("click", "purchase")) == (1L, 1.0))
    assert(out.size == 2)
  }

  test("attribution: bookend touches; no prior touch goes to direct") {
    val e = Seq(
      // u1: view then click then purchase -> first=view, last=click
      (1L, 1L, "view", ts(1, 1), 10.0),
      (1L, 2L, "click", ts(1, 2), 0.0),
      (1L, 3L, "purchase", ts(1, 3), 100.0),
      // u2: purchase with no preceding touch -> direct/direct
      (2L, 4L, "purchase", ts(2), 50.0),
      // u3: an error event is not a touch
      (3L, 5L, "error", ts(3, 1), 0.0),
      (3L, 6L, "purchase", ts(3, 2), 25.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val out = Behavior.attribution(e).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("click", "view")) == (1L, 100.0))
    assert(out(("direct", "direct")) == (2L, 75.0))
    assert(out.size == 2)
  }

  test("sessionPaths: gap splits sessions; paths order by ts then id") {
    val e = Seq(
      (1L, 1L, "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2L, "click", Timestamp.valueOf("2024-01-01 00:10:00")),
      (1L, 3L, "purchase", Timestamp.valueOf("2024-01-01 00:20:00")),
      (1L, 4L, "error", Timestamp.valueOf("2024-01-01 02:00:00")),
      (2L, 5L, "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, 6L, "view", Timestamp.valueOf("2024-01-01 00:40:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Behavior.sessionPaths(e).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(out.head == (("view", 2L)), "u2's two singleton view sessions")
    assert(out.toSet == Set(("view", 2L), ("view>click>purchase", 1L),
      ("error", 1L)))
  }

  test("sessionPaths: exactly-30-minute gap does NOT split") {
    val e = Seq(
      (1L, 1L, "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2L, "click", Timestamp.valueOf("2024-01-01 00:30:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Behavior.sessionPaths(e).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("view>click", 1L)))
  }

  test("snapshotDiff: added/removed/changed/unchanged partition the keys") {
    val o = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("event_id", "value")
    val n = Seq((2L, 2.0), (3L, 30.0), (4L, 4.0)).toDF("event_id", "value")
    val out = Quality.snapshotDiff(o, n, "event_id", "value").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  private def edges(rows: (Long, Long)*) = rows.toDF("src_a", "src_b")

  test("triangleCount: K4 has 4 wedges under orientation, all closed") {
    val r = Joins.triangleCount(
      edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 4L, 4L)))
  }

  test("triangleCount: degree orientation kills the path wedge") {
    // path 1-2-3: the naive apex-2 wedge never forms because both
    // edges orient TOWARD the degree-2 center
    val r = Joins.triangleCount(edges((1L, 2L), (2L, 3L))).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 0L, 0L)))
  }

  test("triangleCount: triangle with a pendant counts exactly once") {
    val r = Joins.triangleCount(
      edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))).collect().head
    assert(r.getLong(0) == 4L && r.getLong(2) == 1L)
  }

  test("burstDetect: 10x hour flags; RANGE window sees distant buckets") {
    def at(hour: Long, i: Int) = new Timestamp(hour * 3600000L + i * 1000L)
    val rows =
      (0 until 24).flatMap(h => Seq(("a", at(h, 0)))) ++ // 1/hour baseline
        (0 until 10).map(i => ("a", at(24, i))) ++       // 10x spike
        Seq(("a", at(25, 0))) ++                          // back to normal
        (0 until 4).map(i => ("b", at(0, i))) ++          // sparse type
        Seq(("b", at(20, 0)))
    val out = graft.operators.WindowedAggs
      .burstDetect(rows.toDF("event_type", "ts")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // spike hour: 10 events vs trailing sum 24 -> 10*24 > 2*24
    assert(out(("a", 24L)) == ((10L, 24L, 24L, true)))
    // next hour: trailing sum 23*1+10=33 -> 1*24 < 66
    assert(out(("a", 25L)) == ((1L, 33L, 24L, false)))
    // sparse type: hour 0 is 20 buckets back but within RANGE 24;
    // rate vs trailing-24h: 1*24 > 2*4
    assert(out(("b", 20L)) == ((1L, 4L, 1L, true)))
    // hours with an empty trailing window never report
    assert(!out.contains(("a", 0L)) && !out.contains(("b", 0L)))
  }

  test("seasonalAnomaly: flags a drifted hour, passes a stable one") {
    // type 'a' hour 0: baseline mean 10, eval mean 20 (100% drift) ->
    // anomaly; type 'b' hour 0: stable at 10 -> clean
    val rows =
      Seq.tabulate(4)(i => ("a", ts(1 + i), 10.0)) ++
        Seq.tabulate(2)(i => ("a", ts(23 + i), 20.0)) ++
        Seq.tabulate(4)(i => ("b", ts(1 + i), 10.0)) ++
        Seq.tabulate(2)(i => ("b", ts(23 + i), 10.0))
    val e = rows.toDF("event_type", "ts", "value")
    val out = Quality.seasonalAnomaly(e).collect()
      .map(r => (r.getString(0), r.getBoolean(6))).toMap
    assert(out("a") === true)
    assert(out("b") === false)
    val a = Quality.seasonalAnomaly(e).filter(col("event_type") === "a")
      .collect().head
    assert(a.getDouble(4) == 10.0 && a.getDouble(5) == 20.0)
  }
}
