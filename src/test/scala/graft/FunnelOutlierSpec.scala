package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FraudQueries, Quality, TextAnalysis}

/** Behavior pins for the funnel / MAD-outlier / vocab-coverage trio. */
class FunnelOutlierSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def ev(rows: (Long, String, Long)*) =
    rows.map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: stages must clear strictly in order") {
    // u1 full ordered funnel; u2 clicked BEFORE viewing (click must not
    // count; a later click does); u3 purchase before click (no purchase);
    // u4 view only; u5 never viewed (invisible to every stage)
    val e = ev(
      (1L, "view", 10), (1L, "click", 20), (1L, "purchase", 30),
      (2L, "click", 5), (2L, "view", 10), (2L, "click", 15),
      (3L, "view", 10), (3L, "purchase", 15), (3L, "click", 20),
      (4L, "view", 10),
      (5L, "click", 10), (5L, "purchase", 20))
    val r = FraudQueries.funnel(e).collect().head
    assert(r.getLong(0) == 4L, "n_view: u1..u4")
    assert(r.getLong(1) == 3L, "n_click: u1; u2, u3 via their post-view clicks")
    // u3's purchase precedes their qualifying click — only u1 converts
    assert(r.getLong(2) == 1L, "n_purchase: only u1 purchased after click")
    assert(r.getDouble(3) == 0.75)
    assert(r.getDouble(4) == 1.0 / 3.0)
  }

  test("funnel: simultaneous timestamps do not clear the next stage") {
    // strict > means a click at exactly t_view is not 'after viewing'
    val e = ev((1L, "view", 10), (1L, "click", 10))
    val r = FraudQueries.funnel(e).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L)
    assert(r.isNullAt(4), "empty click stage yields a NULL rate, not an error")
  }

  test("madOutliers: median/MAD exact on an odd run; robust to one spike") {
    // values 1..7 plus a 1e9 spike: mean/std would blow up; the median
    // barely moves (4 -> 4.5) and the MAD stays ~2, so exactly the
    // spike is flagged
    val e = (Seq.tabulate(7)(i => ("a", (i + 1).toDouble)) :+ ("a", 1e9))
      .toDF("event_type", "value")
    val r = Quality.madOutliers(e).collect().head
    assert(r.getDouble(1) == 4.5, "interpolated median of 1..7 + spike")
    assert(r.getDouble(2) == 2.0, "MAD of deviations {3.5,2.5,1.5,.5}x2+spike")
    assert(r.getLong(3) == 8L)
    assert(r.getLong(4) == 1L, "only the 1e9 spike exceeds 3 robust sigmas")
  }

  test("madOutliers: constant series has zero MAD and zero outliers") {
    val e = Seq.fill(5)(("k", 7.0)).toDF("event_type", "value")
    val r = Quality.madOutliers(e).collect().head
    assert(r.getDouble(1) == 7.0 && r.getDouble(2) == 0.0)
    assert(r.getLong(4) == 0L)
  }

  test("vocabCoverage matches the brute-force frequency-order cut") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val out = TextAnalysis.vocabCoverage(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._3)
    // brute force: full frequency table, sort desc by (n, tok asc),
    // running sum, keep while cum*20 <= total*19
    val counts = d.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val expect = counts.sortBy { case (t, n) => (-n, t) }
      .scanLeft(("", 0L, 0L)) { case ((_, _, cum), (t, n)) => (t, n, cum + n) }
      .drop(1)
      .takeWhile { case (_, _, cum) => cum * 20 <= total * 19 }.toList
    assert(out == expect)
    // the cut is maximal: the next token would cross the 95% line
    if (expect.size < counts.length) {
      val nextCum = expect.lastOption.map(_._3).getOrElse(0L) +
        counts.sortBy { case (t, n) => (-n, t) }.apply(expect.size)._2
      assert(nextCum * 20 > total * 19)
    }
  }
}
