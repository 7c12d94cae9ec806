package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan #2 (SURVEY §2.8 tier c): a native
  * sort-merge AS-OF join.
  *
  * `Joins.asOfJoin` expresses point-in-time lookup as union + keyed
  * window — correct and one-shuffle, but it moves BOTH sides through
  * one union stream, carries every left payload column through the
  * window state, and materializes the whole frame per key. This
  * operator is the form a native engine uses (and what
  * pandas/DuckDB/QuestDB implement): co-partition the two sides on
  * the key, sort each by (key, ts), and stream-merge — each
  * partition advances two iterators ONCE, holding exactly one
  * candidate right row. Per-partition state is O(1); neither side's
  * payload rides through the other's rows.
  *
  * Semantics (identical to `Joins.asOfJoin`, property-pinned): for
  * every left row, the `carry` values of the LAST right row of the
  * same key with `right.ts <= left.ts` (ties include the update);
  * null when no such row. Right rows should be unique per (key, ts)
  * — with duplicates the merge keeps the last in sort order, the
  * same caveat as the window form.
  *
  * Columns are carried BY NAME, resolved against the children at
  * plan time — never as captured Attribute fields, which go stale
  * when the analyzer deduplicates a right subtree that shares its
  * source (and therefore its expression ids) with the left.
  * Keys and timestamps are assumed non-null on the fraud surface;
  * right rows with a null key or ts are skipped, null-key left rows
  * carry null.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        keyName: String, tsName: String,
                        carryNames: Seq[String]) extends BinaryNode {
  private def rAttr(n: String): Attribute = right.output.find(_.name == n)
    .getOrElse(throw new IllegalArgumentException(s"no right column $n"))
  override def output: Seq[Attribute] =
    left.output ++ carryNames.map(rAttr(_).withNullability(true))
  // name-based columns are invisible to QueryPlan's expression walk —
  // without this, ColumnPruning under e.g. count() strips the carry
  // and key columns out of the children
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output.filter(a =>
        a.name == keyName || a.name == tsName || carryNames.contains(a.name)))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(keyName: String, tsName: String,
                        carryNames: Seq[String],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  private def attrIn(out: Seq[Attribute], n: String): Attribute =
    out.find(_.name == n)
      .getOrElse(throw new IllegalStateException(s"no column $n"))
  private def lKeyAttr = attrIn(left.output, keyName)
  private def lTsAttr = attrIn(left.output, tsName)
  private def rKeyAttr = attrIn(right.output, keyName)
  private def rTsAttr = attrIn(right.output, tsName)
  private def carryAttrs = carryNames.map(attrIn(right.output, _))

  override def output: Seq[Attribute] =
    left.output ++ carryAttrs.map(_.withNullability(true))

  // co-partitioning on the key: EnsureRequirements inserts compatible
  // exchanges exactly as it does for a shuffled equi-join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKeyAttr)) ::
      ClusteredDistribution(Seq(rKeyAttr)) :: Nil

  // each side sorted by (key, ts): the merge is then a single pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKeyAttr, Ascending), SortOrder(lTsAttr, Ascending)),
    Seq(SortOrder(rKeyAttr, Ascending), SortOrder(rTsAttr, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(lKeyAttr, Ascending), SortOrder(lTsAttr, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyDt = lKeyAttr.dataType
    val tsDt = lTsAttr.dataType
    val keyOrd = TypeUtils.getInterpretedOrdering(keyDt)
    val tsOrd = TypeUtils.getInterpretedOrdering(tsDt)
    val lKeyIdx = left.output.indexWhere(_.name == keyName)
    val lTsIdx = left.output.indexWhere(_.name == tsName)
    val rKeyIdx = right.output.indexWhere(_.name == keyName)
    val rTsIdx = right.output.indexWhere(_.name == tsName)
    val carryRefs = carryAttrs.map { a =>
      BoundReference(right.output.indexWhere(_.name == a.name), a.dataType,
        nullable = true)
    }
    val nCarry = carryNames.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val carryProj = UnsafeProjection.create(carryRefs)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullCarry = new GenericInternalRow(nCarry)
      val joined = new JoinedRow
      val rBuf = rit.buffered
      // held = carry projection of the best right row so far, valid
      // for heldKey only — O(1) state per partition
      var heldKey: Any = null
      var held: InternalRow = null
      lit.map { lrow =>
        val k = lrow.get(lKeyIdx, keyDt)
        val t = lrow.get(lTsIdx, tsDt)
        if (k != null && t != null) {
          // advance the right side through every row at-or-before t
          // for keys up to and including k; remember only k's rows
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hk = head.get(rKeyIdx, keyDt)
            val ht = head.get(rTsIdx, tsDt)
            if (hk == null || ht == null) { rBuf.next() } // skip
            else {
              val c = keyOrd.compare(hk, k)
              if (c < 0 || (c == 0 && tsOrd.compare(ht, t) <= 0)) {
                val row = rBuf.next()
                if (c == 0) {
                  // copy the key VALUE: hk may point into a reused
                  // UnsafeRow buffer that next() advances past
                  heldKey = InternalRow.copyValue(hk)
                  held = carryProj(row).copy()
                }
              } else advance = false
            }
          }
          val carryRow =
            if (held != null && keyOrd.compare(heldKey, k) == 0) held
            else nullCarry
          outProj(joined(lrow, carryRow))
        } else outProj(joined(lrow, nullCarry))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)
}

/** Planner strategy: logical AsOfJoinNode → the merge exec (the key
  * exchanges and the (key, ts) sorts come from the exec's required
  * distribution/ordering via EnsureRequirements).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, key, ts, carry) =>
      AsOfJoinExec(key, ts, carry, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
