package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Features, Scoring}
import graft.operators.{Joins, Velocity}

class FraudOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("multi-horizon velocity counts include the event itself (read-your-writes)") {
    val ev = Seq(
      (1L, 10L, t(0), 100.0), (2L, 10L, t(2), 50.0), (3L, 10L, t(10), 25.0),
      (4L, 20L, t(0), 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    val v = Velocity.multiHorizon(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_5min")).toMap
    assert(v(1L) == 1)  // first event of user 10
    assert(v(2L) == 2)  // within 5 min of event 1
    assert(v(3L) == 1)  // 10 min later: outside 5-min horizon
    assert(v(4L) == 1)  // other user unaffected
  }

  test("as-of join: latest at-or-before value, ties include the update") {
    val left = Seq((1L, 10L, t(0), 1.0), (2L, 10L, t(5), 1.0),
                   (3L, 10L, t(10), 1.0), (4L, 20L, t(1), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((10L, t(5), 42.0), (10L, t(9), 43.0))
      .toDF("user_id", "ts", "profile_value")
    val out = Joins.asOfJoin(left, right, "user_id", "ts", "profile_value")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L).isEmpty)          // before any update
    assert(out(2L).contains(42.0))   // same-instant update visible
    assert(out(3L).contains(43.0))   // latest, not first
    assert(out(4L).isEmpty)          // other key untouched
  }

  test("adaptive salt leaves co-occurrence output identical on a hot via") {
    // one via shared by 60 sources (hot at saltCap=16 → g=4 buckets),
    // plus cold vias; pair set must match the direct computation
    val edges = ((1 to 60).map(s => (s.toLong, 999L)) ++
      Seq((1L, 5L), (2L, 5L), (70L, 6L), (71L, 6L)))
      .toDF("src", "via")
    val out = Joins.coOccurrence(edges, "src", "via", saltCap = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // direct: C(60,2) pairs through 999, plus (1,2) via both 999 and 5
    assert(out.size == 60 * 59 / 2 + 1)  // +1: (70,71)
    assert(out((1L, 2L)) == 2)           // shares vias 999 AND 5
    assert(out((70L, 71L)) == 1)
    assert(out((1L, 3L)) == 1)
  }

  test("bounded co-occurrence: minShared prunes, topN keeps strongest neighbors") {
    // (1,2) share 3 vias, (1,3) share 2, (1,4) share 1
    val edges = (Seq(101L, 102L, 103L).flatMap(v => Seq((1L, v), (2L, v))) ++
      Seq(104L, 105L).flatMap(v => Seq((1L, v), (3L, v))) ++
      Seq((1L, 106L), (4L, 106L))).toDF("src", "via")
    val all = Joins.coOccurrence(edges, "src", "via")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all == Map((1L, 2L) -> 3L, (1L, 3L) -> 2L, (1L, 4L) -> 1L))
    // minShared=2 drops (1,4); topNPerSrc=1 keeps only the strongest
    val bounded = Joins.coOccurrence(edges, "src", "via",
        minShared = 2L, topNPerSrc = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bounded == Map((1L, 2L) -> 3L))
  }

  test("dense co-occurrence strategy is row-identical to the salted join") {
    // duplicate edges, a hot via, and bounded-output parameters all at
    // once: the two physical strategies must agree exactly
    val edges = ((1 to 25).map(s => (s.toLong, 999L)) ++
      Seq((1L, 5L), (2L, 5L), (1L, 5L), (70L, 6L), (71L, 6L), (3L, 7L)))
      .toDF("src", "via")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows(Joins.coOccurrenceDense(edges, "src", "via")) ==
           rows(Joins.coOccurrence(edges, "src", "via", saltCap = 8)))
    assert(rows(Joins.coOccurrenceDense(edges, "src", "via",
             minShared = 2L, topNPerSrc = 3)) ==
           rows(Joins.coOccurrence(edges, "src", "via", saltCap = 8,
             minShared = 2L, topNPerSrc = 3)))
  }

  test("velocity 1h horizon accumulates past the 5min one") {
    val ev = Seq((1L, 1L, t(0), 1.0), (2L, 1L, t(30), 1.0), (3L, 1L, t(59), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = Velocity.multiHorizon(ev).filter($"event_id" === 3).head()
    assert(r.getAs[Long]("n_5min") == 1 && r.getAs[Long]("n_1h") == 3)
    assert(r.getAs[Double]("amt_1h") == 3.0)
  }

  test("interval join pairs only within the window, ordered") {
    val ev = Seq(
      (1L, 1L, t(0), "purchase"), (2L, 1L, t(3), "error"),
      (3L, 1L, t(20), "login"), (4L, 2L, t(1), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val pairs = Joins.intervalJoin(ev, "user_id", "ts").collect()
    assert(pairs.map(r => (r.getLong(1), r.getLong(2))).toSet == Set((1L, 2L)))
    assert(pairs.head.getDouble(3) == 0.3) // error risk factor
  }

  test("rule score clamps to [0,1] and ladders deterministically") {
    val df = Seq((true, true, true, true, true), (false, false, false, false, false))
      .toDF("a", "b", "c", "d", "e")
    val s = Scoring.ruleScore(Seq(
      col("a") -> 0.5, col("b") -> 0.5, col("c") -> 0.5,
      col("d") -> 0.5, col("e") -> 0.5))
    val out = df.select(s.as("s")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 0.0)) // clamped from 2.5
  }

  test("haversine: known distance NYC->LA ~ 3936 km") {
    val df = Seq((40.7128, -74.0060, 34.0522, -118.2437))
      .toDF("lat1", "lon1", "lat2", "lon2")
    val d = df.select(Features.haversineKm(
      col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 3935.7) < 1.0)
  }

  test("amount cluster key matches log-scale semantics without libm") {
    val df = Seq(1.0, 9.99, 10.0, 99.0, 100.0, 12345.0).toDF("v")
    val out = df.select(Features.amountClusterKey(col("v")).as("k"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("amount_0_1", "amount_0_9", "amount_1_1",
      "amount_1_9", "amount_2_1", "amount_4_1"))
  }

  test("ensemble combiners: unanimous high scores vote 1") {
    val df = Seq((0.9, 0.8, 0.7)).toDF("s1", "s2", "s3")
    val out = df.select(
      Scoring.majorityVote(Seq(col("s1"), col("s2"), col("s3"))).as("v"),
      Scoring.weightedAverage(Seq(col("s1") -> 0.5, col("s2") -> 0.25,
        col("s3") -> 0.25)).as("w")).head()
    assert(out.getInt(0) == 1)
    assert(math.abs(out.getDouble(1) - 0.825) < 1e-12)
  }

  test("banded join pre-aggregates before joining (cardinality = bands)") {
    val li = Seq((100.0, 1), (150.0, 2), (950.0, 3))
      .toDF("l_extendedprice", "x")
    val p = Seq((120.0, 1), (980.0, 2)).toDF("p_retailprice", "y")
    val out = Joins.bandedJoin(li, p, width = 100.0).collect()
    assert(out.length == 2) // bands 100 and 900 only
  }
}
