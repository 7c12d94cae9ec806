package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY §2.8 tier c): top-K rows per key
  * as a first-class physical operator.
  *
  * The declarative spelling — `row_number() OVER (PARTITION BY key
  * ORDER BY o) <= k` — shuffles EVERY row of the child and then fully
  * sorts each key group, even though only k rows per key survive. This
  * operator runs the same two-phase shape as an aggregate instead:
  *
  *   PartialTopKExec   per input partition, bounded heap of k rows per
  *                     key (no distribution requirement, runs before
  *                     the exchange) — shuffle volume drops from |rows|
  *                     to ≤ k·|keys per partition|;
  *   FinalTopKExec     requires ClusteredDistribution(key) (the
  *                     planner inserts the hash exchange), merges the
  *                     partial heaps to the global per-key top k.
  *
  * The reference's "recent N per entity" Redis lists
  * (RedisService.java:296-321) are exactly this access pattern; at
  * 100 TB the partial phase is the difference between shuffling the
  * stream and shuffling k rows per key per partition.
  *
  * Both phases keep one k-bounded heap per key in a hash map — state
  * is O(|keys in partition| · k), the same bound a partial aggregation
  * gives, and rows are compared with the interpreted ordering of the
  * requested SortOrder (ties broken by the caller supplying a unique
  * trailing sort column, which also makes results deterministic and
  * oracle-checkable).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan,
                          maxPartialKeys: Int = PartialTopKExec.DefaultMaxKeys)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

private[plans] object TopKKernel {
  /** Shared partition kernel: bounded per-key heaps over an iterator.
    *
    * Memory is bounded at `maxKeys · (k heap rows + 1 key)` per
    * partition. When a PARTIAL run sees more distinct keys than
    * `maxKeys`, rows of overflow keys BYPASS the heap map and flow to
    * the final phase untrimmed (where its reducer, holding only its
    * own key range, applies the real top-k) — graceful degradation to
    * the aggregate-style no-partial plan instead of an OOM, the same
    * contract as Spark's partial aggregation falling back to
    * pass-through on hash overflow. The FINAL phase must never
    * pass through (its output IS the answer), so it runs uncapped;
    * its state is bounded by keys-per-reducer, the same bound a final
    * hash aggregation has. `onPassThrough` feeds the operator metric.
    */
  def topK(it: Iterator[InternalRow], keys: Seq[Expression],
           order: Seq[SortOrder], k: Int, output: Seq[Attribute],
           maxKeys: Int = Int.MaxValue,
           onPassThrough: Long => Unit = _ => ()): Iterator[InternalRow] = {
    if (k <= 0) return Iterator.empty
    val keyProj = UnsafeProjection.create(keys, output)
    val ordering = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .create(order, output)
    // max-heap on the ordering: the ROOT is the worst retained row, so
    // a better incoming row evicts it in O(log k)
    val heaps = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.PriorityQueue[InternalRow]]()
    var passed = 0L
    val passThrough = it.flatMap { row =>
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null && heaps.size() >= maxKeys) {
        passed += 1
        Some(row.copy()) // overflow key: defer trimming to the final phase
      } else {
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue
            .empty[InternalRow](ordering.asInstanceOf[Ordering[InternalRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
        None
      }
    }
    import scala.jdk.CollectionConverters._
    // ++ evaluates its right operand lazily: the heap drain (and the
    // metric update) run only after the input is exhausted
    passThrough ++ {
      onPassThrough(passed)
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }
}

case class PartialTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, child: SparkPlan,
                           maxKeys: Int = PartialTopKExec.DefaultMaxKeys)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override lazy val metrics = Map(
    "passThroughRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows passed through on key overflow"))
  override protected def doExecute(): RDD[InternalRow] = {
    val metric = longMetric("passThroughRows")
    child.execute().mapPartitions(
      TopKKernel.topK(_, keys, order, k, child.output, maxKeys,
        metric.add), true)
  }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object PartialTopKExec {
  /** Partial-phase state cap: 1M keys ≈ k+1 rows each — comparable to
    * a partial hash aggregation's in-memory map before it degrades.
    */
  val DefaultMaxKeys: Int = 1 << 20
}

case class FinalTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKKernel.topK(_, keys, order, k, child.output), true)
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Planner strategy: logical TopKPerKeyNode → partial + final pair
  * (the exchange between them comes from FinalTopKExec's required
  * distribution — EnsureRequirements inserts it like any aggregate).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, maxPartialKeys) =>
      FinalTopKExec(keys, order, k,
        PartialTopKExec(keys, order, k, planLater(child),
          maxPartialKeys)) :: Nil
    case _ => Nil
  }
}
