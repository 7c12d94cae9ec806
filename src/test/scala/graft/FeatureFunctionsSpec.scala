package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Features
import graft.streaming.{StatefulOps, TransactionPipeline}
import graft.streaming.StatefulOps.TaggedEvent

/** Systematic coverage of the §2.6 scalar feature library not already
  * exercised by oracle queries, plus J6 correlation and the S4 JSON
  * round-trip.
  */
class FeatureFunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("string-risk predicates: merchant name, private IP, user agent") {
    val df = Seq(
      ("Crypto Exchange Ltd", "192.168.1.4", "bot/2.0"),
      ("Corner Grocery", "8.8.8.8",
       "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/115"),
      ("GIFT CARD OUTLET", "172.16.0.9", "crawler-x"))
      .toDF("name", "ip", "ua")
    val out = df.select(
      Features.isHighRiskMerchantName($"name").as("m"),
      Features.isPrivateIp($"ip").as("i"),
      Features.isSuspiciousUserAgent($"ua").as("u")).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((true, true, true), (false, false, false),
      (true, true, true)))
  }

  test("preferred-window, known-device, map-get-default") {
    val df = Seq((Timestamp.valueOf("2024-01-01 10:30:00"), 9, 18,
      Seq("fpA", "fpB"), "fpB", Map("count" -> "7")))
      .toDF("ts", "start", "end", "fps", "fp", "m")
    val r = df.select(
      Features.inPreferredWindow($"ts", $"start", $"end").as("w"),
      Features.isKnownDevice($"fps", $"fp").as("k"),
      Features.mapGetDefault($"m", "count", lit("0")).cast("int").as("c"),
      Features.mapGetDefault($"m", "missing", lit("0")).cast("int").as("d"))
      .head()
    assert(r.getBoolean(0) && r.getBoolean(1))
    assert(r.getInt(2) == 7 && r.getInt(3) == 0)
  }

  test("cleanText matches the reference's lower+strip+squish chain") {
    val out = Seq("Hello,  WORLD!! 42 &c.").toDF("t")
      .select(Features.cleanText($"t")).head().getString(0)
    assert(out == "hello world 42 c")
  }

  test("pattern key and amount band compose deterministically") {
    val r = Seq(("credit_card", "electronics", 557.0))
      .toDF("pm", "cat", "amt")
      .select(Features.patternKey($"pm", $"cat", $"amt").as("k"),
              Features.amountBand($"amt").as("b")).head()
    assert(r.getString(0) == "pattern_credit_card_electronics_medium")
    assert(r.getLong(1) == 500L)
  }

  test("J6: cross-stream correlation emits only cross-stream pairs in window") {
    def t(sec: Int) = new Timestamp(sec * 1000L)
    val events = Seq(
      TaggedEvent("u1", "txn", t(0), 100.0),
      TaggedEvent("u1", "behavior", t(30), 1.0),   // within 5 min → pair
      TaggedEvent("u1", "txn", t(40), 50.0),        // pairs with behavior
      TaggedEvent("u1", "behavior", t(400), 2.0),   // 360s gap > 5min → no pair
      TaggedEvent("u2", "txn", t(0), 9.0))          // alone → nothing
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TaggedEvent](spark)
    in.addData(events: _*)
    val q = StatefulOps.correlate(in.toDS()).toDF()
      .writeStream.format("memory").queryName("corrq")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("corrq")
      .select($"key", $"stream_a", $"stream_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 2) // (txn@0,behavior@30), (behavior@30,txn@40)
    assert(rows.forall { case (k, a, b) => k == "u1" && a != b })
  }

  test("S4: transaction JSON serialization round-trips through parseJson") {
    val users = Seq(("u1", 0.2, "verified", 100.0))
      .toDF("user_id", "risk_score", "kyc_status", "avg_transaction_amount")
    val merchants = Seq(("m1", 0.01, "low", false))
      .toDF("merchant_id", "fraud_rate", "risk_level", "is_blacklisted")
    val raw = Seq(
      """{"transaction_id":"rt1","user_id":"u1","merchant_id":"m1",
        |"amount":42.5,"currency":"USD","timestamp":"2024-03-05T08:30:00Z",
        |"user_agent":"Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101",
        |"geolocation":{"lat":40.0,"lon":-74.0},
        |"merchant_location":{"lat":40.0,"lon":-74.0}}""".stripMargin)
      .toDF("json")
    val parsed = TransactionPipeline.parseJson(raw)
    // serialize back (S4) and re-parse — stable fields survive
    val reser = parsed.select(to_json(struct(
      parsed.columns.filterNot(_ == "parse_error").map(col): _*)).as("json"))
    val round = TransactionPipeline.parseJson(reser)
      .select("transaction_id", "amount", "currency", "timestamp").head()
    assert(round.getString(0) == "rt1")
    assert(round.getDouble(1) == 42.5)
    assert(round.getString(2) == "USD")
    assert(round.getTimestamp(3) == Timestamp.valueOf("2024-03-05 08:30:00"))
  }
}
