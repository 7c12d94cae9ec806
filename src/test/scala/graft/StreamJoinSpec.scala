package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.schema._
import graft.streaming.WindowedStreams
import graft.streaming.StatefulOps.KeyedEvent

class StreamJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // NOT epoch-based: Spark's initial global watermark is 0 (the
  // epoch), so stream-stream joins treat epoch-time rows as late and
  // drop them on arrival — event times must be after 1970.
  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def t(min: Int) = new Timestamp(base + min * 60000L)

  test("watermarked stream-stream interval join pairs within the bound") {
    val left = MemoryStream[KeyedEvent](spark)
    val right = MemoryStream[KeyedEvent](spark)
    val l = left.toDF().withColumnRenamed("key", "user_id")
      .withColumn("event_id", $"value".cast("long"))
    val r = right.toDF().withColumnRenamed("key", "user_id")
      .withColumn("event_id", $"value".cast("long"))
    val joined = WindowedStreams.streamIntervalJoin(l, r, "user_id", "ts")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    left.addData(KeyedEvent("u1", t(0), 1.0), KeyedEvent("u2", t(0), 2.0))
    right.addData(
      KeyedEvent("u1", t(3), 10.0),   // within 5 min of left@0 → pair
      KeyedEvent("u1", t(20), 11.0),  // outside → no pair
      KeyedEvent("u3", t(1), 12.0))   // no matching key
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssj").select($"eid_a", $"eid_b").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.toSet == Set((1L, 10L)))
  }

  test("streaming session windows close after the gap via watermark") {
    val in = MemoryStream[KeyedEvent](spark)
    val agg = WindowedStreams.sessions(
      in.toDF().withColumnRenamed("key", "user_id"))
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    in.addData(KeyedEvent("u1", t(0), 1.0), KeyedEvent("u1", t(10), 2.0))
    q.processAllAvailable()
    // an event far ahead advances the watermark past the session gap
    in.addData(KeyedEvent("u1", t(120), 3.0))
    q.processAllAvailable(); q.stop()
    val closed = spark.table("sess")
      .selectExpr("n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(closed.contains((2L, 3.0))) // the {0,10} session emitted once
  }

  test("TTL state eviction: ring resets after watermark passes last+ttl") {
    import graft.streaming.StatefulOps
    val in = MemoryStream[KeyedEvent](spark)
    val out = StatefulOps.recentNTtl(in.toDS(), n = 10, ttlMs = 30 * 60000L)
    val q = out.toDF().writeStream.format("memory").queryName("ttlq")
      .outputMode("append").start()
    in.addData(KeyedEvent("a", t(0), 1.0), KeyedEvent("a", t(1), 2.0))
    q.processAllAvailable()
    // another key's events push the watermark past a's last+30min
    in.addData(KeyedEvent("b", t(90), 9.0))
    q.processAllAvailable()
    // a returns: its old ring must be gone (fresh list of length 1)
    in.addData(KeyedEvent("a", t(91), 3.0))
    q.processAllAvailable(); q.stop()
    val aRows = spark.table("ttlq").filter($"key" === "a")
      .orderBy($"ts").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("recent").toSeq)
    assert(aRows.toSeq == Seq(Seq(1.0), Seq(2.0, 1.0), Seq(3.0)))
  }

  test("typed Dataset encoders round-trip the canonical fraud schema") {
    val tx = Transaction("t1", "u1", "m1", 42.50, "USD", "purchase",
      "credit_card", "visa", "1234", t(0), "10.0.0.1", "d1", "fp1",
      "Mozilla/5.0", GeoPoint(40.7, -74.0), GeoPoint(40.8, -73.9),
      is_weekend = false, hour_of_day = 12, is_fraud = false,
      fraud_type = None, fraud_score = 0.1, processing_time_ms = 5)
    val profile = UserProfile("u1", "US", "NYC", t(0), "verified", 0.2,
      150.0, 4, Seq("m1"), Seq("fp1", "fp2"),
      BehavioralPatterns(8, 22, 0.5, 0.01, 0.8))
    val ds = Seq(tx).toDS()
    val back = ds.head()
    assert(back == tx)
    assert(Seq(profile).toDS().head() == profile)
    // and the Dataset is queryable relationally
    assert(ds.filter(_.amount > 40.0).count() == 1)
  }
}
