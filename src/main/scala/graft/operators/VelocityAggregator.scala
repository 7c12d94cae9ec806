package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator mirroring the reference's incremental
  * UserVelocityAggregate (reference: windows/WindowProcessor.java:
  * 248-352: createAccumulator/add/getResult/merge) — the same
  * contract Spark's Aggregator[IN, BUF, OUT] formalizes, which is
  * what makes partial (map-side) aggregation correct: `merge` must be
  * associative and commutative (property-tested in AggregatorSpec).
  *
  * Differences by design: amounts accumulate as exact cents (long),
  * distinct merchant/method tracking is a bounded Set here (exact,
  * for the typed path) — the untyped surface offers
  * approx_count_distinct for the 100 TB path (see
  * plans.ApproxDistinctRewrite).
  */
final case class VelocityEvent(user_id: String, amount: Double,
                               fraud_score: Double, merchant_id: String,
                               payment_method: String, ts_ms: Long)

final case class VelocityAcc(n: Long, sumCents: Long, highRisk: Long,
                             merchants: Set[String], methods: Set[String],
                             minTs: Long, maxTs: Long)

final case class VelocityStats(n_events: Long, total_amount: Double,
                               high_risk_count: Long, n_merchants: Int,
                               n_methods: Int, first_ms: Long, last_ms: Long,
                               avg_amount: Double, velocity_score: Double)

class UserVelocityAggregator
    extends Aggregator[VelocityEvent, VelocityAcc, VelocityStats] {

  override def zero: VelocityAcc =
    VelocityAcc(0L, 0L, 0L, Set.empty, Set.empty, Long.MaxValue, Long.MinValue)

  override def reduce(b: VelocityAcc, e: VelocityEvent): VelocityAcc =
    VelocityAcc(
      b.n + 1,
      b.sumCents + math.round(e.amount * 100),
      b.highRisk + (if (e.fraud_score > 0.7) 1 else 0),
      b.merchants + e.merchant_id,
      b.methods + e.payment_method,
      math.min(b.minTs, e.ts_ms),
      math.max(b.maxTs, e.ts_ms))

  override def merge(a: VelocityAcc, b: VelocityAcc): VelocityAcc =
    VelocityAcc(a.n + b.n, a.sumCents + b.sumCents, a.highRisk + b.highRisk,
      a.merchants ++ b.merchants, a.methods ++ b.methods,
      math.min(a.minTs, b.minTs), math.max(a.maxTs, b.maxTs))

  /** WindowProcessor.java:490-500's rule-based velocity score:
    * transaction-count pressure + high-risk share + merchant fan-out,
    * clamped to [0,1].
    */
  override def finish(r: VelocityAcc): VelocityStats = {
    val avg = if (r.n == 0) 0.0 else r.sumCents / 100.0 / r.n
    val score = math.min(1.0,
      0.4 * math.min(1.0, r.n / 20.0) +
      0.4 * (if (r.n == 0) 0.0 else r.highRisk.toDouble / r.n) +
      0.2 * math.min(1.0, r.merchants.size / 10.0))
    VelocityStats(r.n, r.sumCents / 100.0, r.highRisk,
      r.merchants.size, r.methods.size, r.minTs, r.maxTs, avg, score)
  }

  override def bufferEncoder: Encoder[VelocityAcc] =
    Encoders.product[VelocityAcc]
  override def outputEncoder: Encoder[VelocityStats] =
    Encoders.product[VelocityStats]
}
