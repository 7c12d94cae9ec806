package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Sketch accuracy vs exact twins on real table data — the contract
  * is bounded error at bounded state, not bit-equality (sketches are
  * not cross-engine reproducible, hence test-covered rather than
  * oracle-checked).
  */
class SketchesSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = sources.Tables(spark, sf, "events")

  test("HLL distinct counts stay within 15% of exact per key") {
    val rows = Sketches.approxUserTypes(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) <= math.max(1.0, 0.15 * exact),
        s"user ${r.get(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx percentiles land within 5% of exact") {
    val r = Sketches.approxValuePercentiles(events).head()
    val approx = r.getSeq[Double](0)
    val exact = r.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 0.05 * math.abs(e) + 1e-9, s"$a vs $e")
    }
  }

  test("count-min sketch overestimates by at most eps*N") {
    val n = events.count()
    val exact = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = exact.keys.toSeq
    Sketches.cmsCounts(events, "event_type", probes).foreach {
      case (k, est) =>
        assert(est >= exact(k), "CMS never undercounts")
        assert(est <= exact(k) + (0.001 * n).toLong + 1,
          s"$k: est $est vs exact ${exact(k)}")
    }
  }

  test("frequent items find every truly frequent event type") {
    val n = events.count()
    val truly = events.groupBy("event_type").count().collect()
      .filter(_.getLong(1) > n / 10).map(_.getString(0)).toSet
    val found = Sketches.frequentItems(events, "event_type", 0.1)
      .head().getSeq[String](0).toSet
    assert(truly.subsetOf(found))
  }
}
