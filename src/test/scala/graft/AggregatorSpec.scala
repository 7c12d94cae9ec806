package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Salt, UserVelocityAggregator, VelocityEvent}

class AggregatorSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }
  import TestSpark._
  import spark.implicits._

  private val agg = new UserVelocityAggregator

  private val eventGen: Gen[VelocityEvent] = for {
    u <- Gen.oneOf("u1", "u2", "u3")
    amt <- Gen.choose(1, 100000).map(_ / 100.0)
    fs <- Gen.choose(0, 100).map(_ / 100.0)
    m <- Gen.oneOf("m1", "m2", "m3", "m4")
    pm <- Gen.oneOf("card", "wallet", "bank")
    ts <- Gen.choose(0L, 1000000L)
  } yield VelocityEvent(u, amt, fs, m, pm, ts)

  test("merge is associative and commutative over arbitrary splits") {
    check(Prop.forAll(Gen.listOf(eventGen), Gen.listOf(eventGen),
      Gen.listOf(eventGen)) { (xs, ys, zs) =>
      def fold(l: List[VelocityEvent]) = l.foldLeft(agg.zero)(agg.reduce)
      val (a, b, c) = (fold(xs), fold(ys), fold(zs))
      val assoc = agg.finish(agg.merge(agg.merge(a, b), c)) ==
        agg.finish(agg.merge(a, agg.merge(b, c)))
      val comm = agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a))
      val unit = agg.finish(agg.merge(a, agg.zero)) == agg.finish(a)
      assoc && comm && unit
    })
  }

  test("typed aggregator matches the untyped DataFrame aggregation") {
    val events = (1 to 500).map { i =>
      VelocityEvent(s"u${i % 5}", (i % 97) + 0.25, (i % 10) / 10.0,
        s"m${i % 7}", s"pm${i % 3}", i.toLong)
    }
    val ds = events.toDS()
    val typed = ds.groupByKey(_.user_id)
      .agg(agg.toColumn.name("stats"))
      .collect().map { case (k, s) =>
        (k, s.n_events, s.total_amount, s.n_merchants) }.toSet
    val untyped = ds.toDF().groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        (sum(round($"amount" * 100).cast("long")).cast("double") / 100.0)
          .as("total"),
        countDistinct($"merchant_id").as("nm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3).toInt)).toSet
    assert(typed == untyped)
  }

  test("salted aggregation equals direct aggregation") {
    val df = (1 to 10000).map(i =>
      (if (i % 100 == 0) "cold" + i else "HOT", (i % 777) / 100.0, i.toLong))
      .toDF("k", "v", "rid")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"),
        (sum(round($"v" * 1e4).cast("long")).cast("double") / 1e4).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Salt.saltedCountSum(df, "k", "v", saltFrom = "rid")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
