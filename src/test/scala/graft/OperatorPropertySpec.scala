package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Joins, TopN}

/** Property-based checks for the hand-built operators whose logic is
  * NOT derived from Catalyst primitives — the as-of carry-forward
  * window and the custom TopK physical operator — against brute-force
  * references on random keyed timelines. Each trial runs real Spark
  * jobs, so the trial count is modest (the domains are tiny: 4 keys ×
  * 21 instants, so collisions/ties appear every few trials).
  */
class OperatorPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  private val genEvents = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 20L)
      v <- Gen.choose(1, 1000)
    } yield (key, ts, v.toDouble))
  } yield rows

  test("asOfJoin equals the brute-force latest-at-or-before on random data") {
    check(Prop.forAll(genEvents, genEvents) { (lrows, rrows0) =>
      // right side must be unique per (key, ts): keep max value
      val rrows = rrows0.groupBy(r => (r._1, r._2))
        .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
      val left = lrows.zipWithIndex
        .map { case ((k, t, v), i) => (i.toLong, k, new Timestamp(t * 1000), v) }
      val right = rrows
        .map { case (k, t, v) => (k, new Timestamp(t * 1000), v) }
      val out = Joins.asOfJoin(
          left.toDF("event_id", "user_id", "ts", "value"),
          right.toDF("user_id", "ts", "profile_value"),
          "user_id", "ts", "profile_value")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double]))
        .toMap
      left.forall { case (id, k, ts, _) =>
        val expected = rrows.filter(r => r._1 == k && r._2 * 1000 <= ts.getTime)
          .sortBy(_._2).lastOption.map(_._3)
        out(id) == expected
      }
    })
  }

  test("native TopK equals sort-take per key on random data") {
    check(Prop.forAll(genEvents, Gen.choose(1, 5)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((key, t, v), i) =>
          (i.toLong, key, new Timestamp(t * 1000), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val native = TopN.recentPerKeyNative(df, "user_id", "ts", "event_id", k)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // .toSeq before flatMap: flatMapping a Map into (key, id) pairs
      // would rebuild a Map and collapse to one pair per key
      val expected = rows.zipWithIndex
        .map { case ((key, t, _), i) => (key, t, i.toLong) }
        .groupBy(_._1).toSeq
        .flatMap { case (key, g) =>
          g.sortBy(r => (-r._2, r._3)).take(k).map(r => (key, r._3))
        }.toSet
      native == expected
    })
  }

  test("TopK partial-phase key-overflow fallback preserves results") {
    // maxPartialKeys=1: all but one key per partition pass through the
    // partial phase untrimmed; the final phase must still produce the
    // exact per-key top-k
    check(Prop.forAll(genEvents, Gen.choose(1, 5)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((key, t, v), i) =>
          (i.toLong, key, new Timestamp(t * 1000), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val capped = TopN.topPerKeyNative(df, "user_id", "ts", "event_id", k,
          maxPartialKeys = 1)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val uncapped = TopN.recentPerKeyNative(df, "user_id", "ts",
          "event_id", k)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      capped == uncapped
    })
  }
}
