package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded transaction/profile generator — the Spark
  * re-expression of the reference's Python load simulator
  * (reference: services/data-simulator/src/main/python/simulator.py:206-374,
  * fraud_patterns.py:38-141). All randomness is hash-derived column
  * arithmetic over spark.range ids (xxhash64(id, seed)), so the same
  * (n, seed) always yields byte-identical data on any cluster size —
  * no driver-side RNG, no collect, generation scales linearly with
  * partitions.
  *
  * Fraud scenarios are injected with labels (`is_fraud`,
  * `fraud_type`), mirroring the simulator's labeled patterns:
  *  - card_testing: bursts of micro amounts seconds apart
  *  - amount_spike: single transaction ≫ the user's average
  *  - account_takeover: unseen device + far geolocation
  */
object DataGen {

  /** Uniform double in [0,1) derived from (id, salt, seed). */
  private def u(salt: Int, seed: Long) =
    (pmod(xxhash64(col("id"), lit(salt), lit(seed)), lit(1000000L))
      .cast("double") / 1000000.0)

  def userProfiles(spark: SparkSession, nUsers: Int,
                   seed: Long = 42L): DataFrame =
    spark.range(nUsers).select(
      concat(lit("u"), col("id")).as("user_id"),
      // Beta(2,8)-shaped: min of two uniforms skews low like the
      // simulator's low-risk population (simulator.py:212)
      least(u(1, seed), u(2, seed)).as("risk_score"),
      // lognormal-ish spend level (simulator.py:228)
      exp(u(3, seed) * 3.0 + 2.0).as("avg_transaction_amount"),
      when(u(4, seed) < 0.85, "verified")
        .when(u(4, seed) < 0.97, "pending").otherwise("rejected")
        .as("kyc_status"),
      array(concat(lit("fp"), col("id"), lit("a")),
            concat(lit("fp"), col("id"), lit("b")))
        .as("device_fingerprints"))

  /** `n` transactions across `nUsers`, `fraudPct` of them labeled
    * scenario rows. Timestamps spread over `days` from a fixed epoch.
    */
  def transactions(spark: SparkSession, n: Long, nUsers: Int,
                   seed: Long = 42L, days: Int = 30): DataFrame = {
    val baseTs = lit(1704067200L) // 2024-01-01T00:00:00Z
    val scen = u(10, seed)
    val fraudType =
      when(scen < 0.015, "card_testing")
        .when(scen < 0.025, "amount_spike")
        .when(scen < 0.035, "account_takeover")
        .otherwise(lit(null).cast("string"))
    // card-testing bursts concentrate on 10 attacker-controlled users
    // so per-user velocity actually ramps (simulator card_testing
    // pattern: many micro probes seconds apart)
    val userId =
      when(fraudType === "card_testing",
        pmod(col("id"), lit(math.min(10, nUsers).toLong)))
      .otherwise(pmod(col("id"), lit(nUsers.toLong)))
    val normalAmount = round(exp(u(11, seed) * 3.0 + 2.0) *
      (lit(0.7) + u(12, seed) * 0.6), 2)
    val amount =
      when(col("fraud_type") === "card_testing",
        round(u(13, seed) * 2.0 + 0.5, 2))            // micro probes
      .when(col("fraud_type") === "amount_spike",
        round(exp(u(11, seed) * 3.0 + 2.0) * 40.0, 2)) // ≫ avg
      .otherwise(normalAmount)
    // card_testing bursts: per attacker a ~3-minute probe storm in
    // 2-second steps so 5-min velocity windows light up; others
    // spread uniformly over `days`
    val ts =
      when(col("fraud_type") === "card_testing",
        baseTs + userId * 9000L + (col("id") % 90) * 2)
      .otherwise(baseTs +
        (u(14, seed) * days.toDouble * 86400.0).cast("long"))
    val device =
      when(col("fraud_type") === "account_takeover",
        concat(lit("evil"), col("id")))
      .otherwise(concat(lit("fp"), userId,
        when(u(15, seed) < 0.5, "a").otherwise("b")))
    val lat = when(col("fraud_type") === "account_takeover", lit(55.75))
      .otherwise(lit(40.7) + u(16, seed) * 0.2)
    val lon = when(col("fraud_type") === "account_takeover", lit(37.62))
      .otherwise(lit(-74.0) + u(17, seed) * 0.2)
    spark.range(n)
      .withColumn("fraud_type", fraudType)
      .select(
        concat(lit("t"), col("id")).as("transaction_id"),
        concat(lit("u"), userId).as("user_id"),
        concat(lit("m"), pmod(col("id") * 7L, lit(97L))).as("merchant_id"),
        amount.as("amount"),
        lit("USD").as("currency"),
        when(u(18, seed) < 0.9, "purchase")
          .when(u(18, seed) < 0.95, "refund").otherwise("authorization")
          .as("transaction_type"),
        when(u(19, seed) < 0.5, "credit_card")
          .when(u(19, seed) < 0.8, "debit_card")
          .when(u(19, seed) < 0.95, "digital_wallet")
          .otherwise("bank_transfer").as("payment_method"),
        timestamp_seconds(ts).as("timestamp"),
        device.as("device_fingerprint"),
        struct(lat.as("lat"), lon.as("lon")).as("geolocation"),
        col("fraud_type").isNotNull.as("is_fraud"),
        col("fraud_type"))
  }
}
