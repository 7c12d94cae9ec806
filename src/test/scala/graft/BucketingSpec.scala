package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Proof of the bucketed co-located join: the one up-front shuffle at
  * write time buys Exchange-free joins afterwards.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed-bucketed join plans with NO Exchange on either side") {
    val orders = Tables(spark, sf, "orders")
    val lineitem = Tables(spark, sf, "lineitem")
    Bucketing.writeBucketed(
      orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)
    // force the shuffle-join path to be visible if bucketing is ignored
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), s"plan:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketing must satisfy the join's distribution — no shuffle:\n$p")

      // result parity with the plain shuffle join
      val expect = orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(lineitem.select(col("l_orderkey").as("o_orderkey"),
          col("l_quantity")), Seq("o_orderkey"))
      assert(joined.count() == expect.count())
      assert(joined.exceptAll(expect).isEmpty && expect.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val orders = Tables(spark, sf, "orders")
    Bucketing.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
      "b_orders_agg", "o_orderkey", 8)
    try {
      val agg = spark.table("b_orders_agg")
        .groupBy("o_orderkey").agg(sum("o_totalprice"))
      val p = plan(agg)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucket layout should satisfy the aggregation distribution:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
