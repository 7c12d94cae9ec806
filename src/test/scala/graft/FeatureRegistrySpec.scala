package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FeatureRegistry

/** A10 registry semantics: the catalog drives profiling, null rates
  * surface real absence, categorical shares are a distribution.
  */
class FeatureRegistrySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = sources.Tables(spark, sf, "events")

  test("catalog registers every profiled feature with a kind") {
    val cat = FeatureRegistry.catalog(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (FeatureRegistry.numericNames ++ FeatureRegistry.categoricalNames)
      .foreach(n => assert(cat.contains(n), s"$n missing from catalog"))
    assert(cat.values.toSet == Set("numeric", "categorical"))
  }

  test("numeric stats cover the registry and expose the lag null rate") {
    val stats = FeatureRegistry.numericStats(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.keySet == FeatureRegistry.numericNames.toSet)
    // delta_prev is null exactly once per user (their first event)
    val nUsers = events.select("user_id").distinct().count()
    val d = stats("delta_prev")
    assert(d.getLong(1) - d.getLong(2) == nUsers)
    assert(d.getDouble(3) > 0.0)          // null_rate
    assert(stats("value").getDouble(3) == 0.0)
  }

  test("categorical shares sum to 1 per feature") {
    val shares = FeatureRegistry.valueCounts(events).collect()
      .groupBy(_.getString(0))
      .map { case (f, rows) => f -> rows.map(_.getDouble(3)).sum }
    assert(shares.keySet == FeatureRegistry.categoricalNames.toSet)
    shares.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }
}
