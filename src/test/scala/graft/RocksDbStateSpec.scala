package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.KeyedEvent

/** §2.7 keyed state at scale: the reference externalizes state to
  * Redis; Spark's native answer for state larger than heap is the
  * RocksDB state store provider. This pins that our stateful
  * operators run unchanged on RocksDB and produce identical results
  * to the default (HDFS-backed in-memory) provider.
  */
class RocksDbStateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stateful velocity op runs identically on the RocksDB state store") {
    def run(): Set[(String, Long, Long)] = {
      val in = MemoryStream[KeyedEvent](spark)
      in.addData((1 to 50).map(i =>
        KeyedEvent(s"u${i % 3}", new java.sql.Timestamp(i * 1000L), 1.0)): _*)
      val name = s"rocks_out_${System.nanoTime()}"
      val q = StatefulOps.velocity(in.toDS()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      spark.table(name).select($"key", $"n5min", $"n1h")
        .as[(String, Long, Long)].collect().toSet
    }
    val default = run()
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = run()
      assert(rocks == default && rocks.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
