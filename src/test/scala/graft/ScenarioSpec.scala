package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Features
import graft.gen.DataGen
import graft.operators.Velocity

/** SURVEY §5.5: regenerate labeled fraud scenarios deterministically
  * and assert the detector features actually fire on them.
  */
class ScenarioSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val txns = DataGen.transactions(spark, 20000, nUsers = 50).cache()

  test("generator is deterministic across invocations") {
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(crc32(concat_ws("|", col("transaction_id"),
        col("amount"), col("timestamp"))))).head().getLong(0)
    assert(checksum(txns) ==
      checksum(DataGen.transactions(spark, 20000, nUsers = 50)))
  }

  test("scenario mix lands near the configured rates") {
    val n = txns.count().toDouble
    val byType = txns.groupBy("fraud_type").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("none") -> r.getLong(1))
      .toMap
    assert(byType("none") / n > 0.95)
    Seq("card_testing", "amount_spike", "account_takeover").foreach { s =>
      assert(byType(s) / n > 0.005 && byType(s) / n < 0.02,
        s"$s rate off: ${byType(s) / n}")
    }
  }

  test("card_testing fires micro-amount + high-velocity features") {
    val vel = Velocity.multiHorizon(
      txns.select($"user_id", $"timestamp".as("ts"), $"amount".as("value"),
        $"fraud_type"),
      key = "user_id", ts = "ts", value = "value")
    val flagged = vel
      .withColumn("bucket", Features.amountBucket($"value"))
      .withColumn("hv", $"n_5min" > 5)
    val ct = flagged.filter($"fraud_type" === "card_testing")
    val microRate = ct.filter($"bucket" === "micro").count().toDouble /
      ct.count()
    val hvRate = ct.filter($"hv").count().toDouble / ct.count()
    assert(microRate > 0.95, s"micro rate $microRate")
    assert(hvRate > 0.8, s"high-velocity rate $hvRate")
    // normal traffic almost never trips the velocity flag
    val normal = flagged.filter($"fraud_type".isNull)
    val normalHv = normal.filter($"hv").count().toDouble / normal.count()
    assert(normalHv < 0.05, s"false-positive velocity rate $normalHv")
  }

  test("amount_spike trips the amount-ratio deviation feature") {
    val users = DataGen.userProfiles(spark, 50)
    val joined = txns.join(users, "user_id")
    val ratio = Features.amountRatio($"amount", $"avg_transaction_amount")
    val spikes = joined.filter($"fraud_type" === "amount_spike")
      .filter(ratio > 5.0).count().toDouble /
      joined.filter($"fraud_type" === "amount_spike").count()
    assert(spikes > 0.9, s"spike detection rate $spikes")
  }

  test("account_takeover: unknown device + geo jump fire") {
    val users = DataGen.userProfiles(spark, 50)
    val joined = txns.join(users, "user_id")
    val known = Features.isKnownDevice($"device_fingerprints",
      $"device_fingerprint")
    val far = Features.haversineKm($"geolocation.lat", $"geolocation.lon",
      lit(40.7), lit(-74.0)) > 1000.0
    val ato = joined.filter($"fraud_type" === "account_takeover")
    assert(ato.filter(!known && far).count() == ato.count())
    val normal = joined.filter($"fraud_type".isNull)
    assert(normal.filter(!known).count() == 0)
  }
}
