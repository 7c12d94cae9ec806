package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of scan performance.
  *
  * At 100 TB the scan cost of every query in this library is decided
  * before the query runs, by how the parquet was laid out: min/max
  * row-group statistics prune only if rows with nearby key values sit
  * in the same files. A single-column sort handles one predicate
  * dimension; the Z-ORDER (Morton) key linearizes TWO dimensions into
  * one sort key such that a range predicate on EITHER dimension maps
  * to a bounded number of contiguous zkey ranges — the standard
  * multi-dimensional clustering trick (used by every lakehouse table
  * format; the bit-interleave itself is classic Morton 1966).
  *
  * Everything here is pure column algebra (shift/and/or — all
  * whole-stage codegen) plus the write-side `repartitionByRange` +
  * `sortWithinPartitions` recipe, so it composes with any source.
  */
object Layout {

  /** Morton/Z-order key: interleave the low `bits` bits of `x` and
    * `y` (x in even positions, y in odd). Inputs must be non-negative
    * integral columns; callers bucket raw values first. Unrolled to
    * 2·bits shift/mask terms — a single codegen span, no UDF.
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Events with an 8-bit × 8-bit Z-order layout key over the two
    * dimensions ad-hoc fraud queries actually filter on — amount band
    * (value/4, capped at 255) and time-of-day (6-minute bucket of the
    * day, 0..239). Emitting the key per row is the oracle-checkable
    * part; [[writeRangeLayout]] is the write-side consumer.
    */
  def eventZorder(events: DataFrame): DataFrame = {
    val x = least(floor(col("value") / 4), lit(255)).cast("long")
    val y = floor((hour(col("ts")) * 60 + minute(col("ts"))) / lit(6))
      .cast("long")
    graft.sources.Par.fan(events).select(
      col("event_id"), x.as("amount_band"), y.as("tod_band"),
      zorderKey(x, y, 8).as("zkey"))
  }

  /** GLOBAL SEQUENTIAL INDEX — assign every row its 1-based rank in a
    * deterministic total order, WITHOUT the single-partition collapse
    * a global window (`row_number().over(Window.orderBy(...))`)
    * forces: Spark plans an empty-partitionBy window as one task
    * holding the whole dataset. The scalable spelling is the classic
    * two-phase rank: range-partition + in-partition sort (a real
    * distributed sort), count rows per partition, broadcast the tiny
    * per-partition offset table (numPartitions longs), and add the
    * offset to each row's in-partition position — one extra action
    * over the sort, no data moves twice. The order must be a TOTAL
    * order (include a tiebreaker column) for the result to be
    * deterministic.
    *
    * The training-data consumer: globally numbered examples for
    * reproducible sharding/curriculum order over a corpus that never
    * fits one task.
    */
  def globalIndex(df: DataFrame, sortCols: Seq[String],
                  indexCol: String = "global_idx",
                  numPartitions: Int = 0): DataFrame = {
    val ranged =
      if (numPartitions > 0)
        df.repartitionByRange(numPartitions, sortCols.map(col): _*)
      else df.repartitionByRange(sortCols.map(col): _*)
    val sorted = ranged.sortWithinPartitions(sortCols.map(col): _*)
    // zipWithIndex IS the two-phase rank: one counting job over the
    // sorted partitions, then per-partition offsets added map-side.
    // (One of the few justified .rdd drops in this library: the
    // DataFrame spelling — a window over spark_partition_id() — pays
    // an extra full-data exchange for what is a map-side counter.)
    val rdd = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    df.sparkSession.createDataFrame(rdd,
      sorted.schema.add(indexCol, org.apache.spark.sql.types.LongType,
        nullable = false))
  }

  /** DISTRIBUTED PREFIX SUM (inclusive running total of an integral
    * column in a deterministic total order) — same two-phase shape as
    * [[globalIndex]], and for the same reason: the window spelling
    * (`sum().over(Window.orderBy(...))` with no partitionBy) collapses
    * to one task. Here: range-partition + in-partition sort, ONE tiny
    * job to collect per-partition sums (numPartitions longs to the
    * driver — not data), then a map-side running counter seeded with
    * each partition's offset. Exact by int64 associativity.
    *
    * Consumers: shard/budget packing ([[graft.operators.TextAnalysis
    * .shardPlan]]), curriculum token budgets, quota assignment.
    */
  def prefixSum(df: DataFrame, sortCols: Seq[String], valueCol: String,
                outCol: String = "running_total",
                numPartitions: Int = 0): DataFrame = {
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"prefixSum needs a LONG value column, got ${df.schema(valueCol)}")
    val ranged =
      if (numPartitions > 0)
        df.repartitionByRange(numPartitions, sortCols.map(col): _*)
      else df.repartitionByRange(sortCols.map(col): _*)
    // tracked cache: the sorted frame is consumed twice (offset job +
    // final pass); released by the caller via OperatorCaches
    val sorted = OperatorCaches.track(
      ranged.sortWithinPartitions(sortCols.map(col): _*))
    val perPart = sorted
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum(col(valueCol).cast("long")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + perPart.getOrElse(p, 0L)).toArray
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = offsets(pid)
      it.map { row =>
        running += row.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ running)
      }
    }
    df.sparkSession.createDataFrame(rdd,
      sorted.schema.add(outCol, org.apache.spark.sql.types.LongType,
        nullable = false))
  }

  /** PER-KEY RANK + PER-KEY COUNT, partition-parallel — the keyed
    * sibling of [[globalIndex]], and the scalable spelling of
    * `row_number().over(Window.partitionBy(key).orderBy(...))` +
    * `count().over(Window.partitionBy(key))`. The window spelling
    * hash-partitions on the key, which puts EVERY row of a key in ONE
    * task — at 100 TB with a handful of keys (e.g. corpus sources)
    * that is a single-task sort per key, a straggler by construction.
    *
    * Here the key participates in the RANGE partitioning together
    * with the sort columns, so one key spans as many partitions as
    * its mass needs; per-partition per-key counts ride ONE tiny job
    * to the driver (≤ numPartitions + #keys − 1 rows total, because a
    * key's rows are contiguous across range partitions), per-key
    * prefix offsets seed a map-side running counter, and per-key
    * totals come from the same collected counts. No data moves twice.
    *
    * `sortCols` must make (key, sortCols) a TOTAL order (include a
    * tiebreaker) for deterministic ranks. Output appends `rankCol`
    * (1-based long) and `countCol` (long) to the input schema.
    */
  def keyedRank(df: DataFrame, keyCol: String, sortCols: Seq[Column],
                rankCol: String = "key_rank", countCol: String = "key_n",
                numPartitions: Int = 0): DataFrame =
    keyedRunning(df, keyCol, sortCols, lit(1L), rankCol, Some(countCol),
      numPartitions)

  /** PER-KEY RUNNING TOTAL in a deterministic per-key order — the
    * keyed sibling of [[prefixSum]], and the scalable spelling of
    * `sum(value).over(Window.partitionBy(key).orderBy(...).rowsBetween
    * (unboundedPreceding, currentRow))`, which puts every row of a
    * key in ONE task. Same two-phase machinery as [[keyedRank]]
    * (rank = running total of the constant 1). `valueCol` must be
    * LONG — exact by int64 associativity.
    *
    * NULL contract — one deliberate divergence from the window
    * spelling: null increments add 0 either way, but where the window
    * sum reads NULL for an ALL-null prefix, this emits 0 and the
    * output column is non-nullable. A running total that is "no
    * contribution yet" is 0 in every downstream arithmetic use; a
    * NULL would just reintroduce the null-propagation hazards the
    * LONG-exactness discipline exists to avoid.
    */
  def keyedPrefixSum(df: DataFrame, keyCol: String, sortCols: Seq[Column],
                     valueCol: String, outCol: String = "running_total",
                     numPartitions: Int = 0): DataFrame = {
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"keyedPrefixSum needs a LONG value column, got ${df.schema(valueCol)}")
    keyedRunning(df, keyCol, sortCols, col(valueCol), outCol, None,
      numPartitions)
  }

  /** Shared two-phase engine behind [[keyedRank]]/[[keyedPrefixSum]]:
    * range-partition + in-partition sort on (key, sortCols), ONE tiny
    * job collecting per-partition per-key sums of `inc`, map-side
    * running totals seeded with per-key prefix offsets. When
    * `totalCol` is set, the per-key grand total (known from the same
    * collected sums) is appended too.
    */
  private def keyedRunning(df: DataFrame, keyCol: String,
                           sortCols: Seq[Column], inc: Column,
                           outCol: String, totalCol: Option[String],
                           numPartitions: Int): DataFrame = {
    val order = col(keyCol) +: sortCols
    val withInc = df.withColumn("__inc", inc.cast("long"))
    val ranged =
      if (numPartitions > 0)
        withInc.repartitionByRange(numPartitions, order: _*)
      else withInc.repartitionByRange(order: _*)
    // tracked cache: the sorted frame is consumed twice (sums job +
    // final pass); released by the caller via OperatorCaches
    val sorted = OperatorCaches.track(
      ranged.sortWithinPartitions(order: _*))
    // bounded collect: (pid, key) sums, not data — a key's rows are
    // contiguous under range partitioning, so the pair count is at
    // most numPartitions + #keys - 1
    // null increments count as 0 (the window-sum spelling SKIPS
    // nulls — same running total; we additionally keep the output
    // column non-null where an all-null prefix would read NULL)
    val perPart = sorted
      .groupBy(spark_partition_id().as("pid"), col(keyCol))
      .agg(coalesce(sum(col("__inc")), lit(0L)).as("s")).collect()
      .map(r => (r.getInt(0), r.get(1)) -> r.getLong(2)).toMap
    val totals: Map[Any, Long] =
      perPart.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val offsets: Map[(Int, Any), Long] =
      perPart.keys.groupBy(_._2).flatMap { case (k, pks) =>
        var acc = 0L
        pks.map(_._1).toSeq.sorted.map { p =>
          val o = ((p, k), acc); acc += perPart((p, k)); o
        }
      }
    val kIdx = sorted.schema.fieldIndex(keyCol)
    val iIdx = sorted.schema.fieldIndex("__inc")
    val bc = sorted.sparkSession.sparkContext.broadcast((offsets, totals))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val (off, tot) = bc.value
      var cur: Any = null
      var curSet = false
      var running = 0L
      it.map { row =>
        val k = row.get(kIdx)
        if (!curSet || k != cur) {
          cur = k; curSet = true
          running = off.getOrElse((pid, k), 0L)
        }
        running += (if (row.isNullAt(iIdx)) 0L else row.getLong(iIdx))
        val base = row.toSeq.patch(iIdx, Nil, 1) :+ running
        org.apache.spark.sql.Row.fromSeq(
          totalCol.fold(base)(_ => base :+ tot(k)))
      }
    }
    val longT = org.apache.spark.sql.types.LongType
    val base = org.apache.spark.sql.types.StructType(
        sorted.schema.fields.filterNot(_.name == "__inc"))
      .add(outCol, longT, nullable = false)
    df.sparkSession.createDataFrame(rdd,
      totalCol.fold(base)(c => base.add(c, longT, nullable = false)))
  }

  /** The layout write recipe: range-partition on the layout key so
    * each output file owns a disjoint key span (file-level pruning),
    * sort within partitions so row groups within a file are also
    * clustered (row-group-level pruning). `LayoutSpec` proves the
    * disjointness by reading back with `input_file_name()`.
    */
  def writeRangeLayout(df: DataFrame, keyCol: String, numFiles: Int,
                       path: String): Unit = {
    // ONE output file needs no range bounds: repartitionByRange(1)
    // pays the RangePartitioner's sampling pass (plus the cache below
    // that exists only to absorb it) to decide a placement with
    // exactly one choice. coalesce(1) + the same within-file sort
    // writes identical bytes — disjointness across one file is
    // trivial (r17; the definitions catalog in FeatureStoreOps is the
    // caller).
    if (numFiles == 1) {
      df.coalesce(1).sortWithinPartitions(keyCol)
        .write.mode("overwrite").parquet(path)
      return
    }
    // cache across the RangePartitioner's two passes (r16): range
    // repartitioning SAMPLES its input to pick bounds, then shuffles
    // it — an uncached df computes its whole upstream twice (for the
    // feature store that upstream is a stack + a lag window over the
    // events table). The cache is read once by the sampler and once
    // by the shuffle, then dropped here — never escapes the call.
    // skip the pair when the caller already manages a cache for this
    // frame (r16 ADVICE): unconditionally unpersisting in the finally
    // would drop a shared OperatorCaches entry out from under later
    // consumers (and Spark logs 'Asked to cache already cached data')
    val ownCache =
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val cached = if (ownCache) df.cache() else df
    try
      cached.repartitionByRange(numFiles, col(keyCol))
        .sortWithinPartitions(keyCol)
        .write.mode("overwrite").parquet(path)
    finally if (ownCache) cached.unpersist()
  }
}
