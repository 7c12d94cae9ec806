package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout — the co-located-join lever that matters
  * most at 100 TB: two fact tables bucketed on their join key with
  * the same bucket count join WITHOUT a shuffle on either side
  * (Spark recognizes the bucketing as a satisfying
  * HashPartitioning, so the Exchange nodes vanish from the plan and
  * the join cost collapses to a per-bucket sort-merge). The write
  * pays one up-front shuffle; every subsequent join, aggregation,
  * or window on the bucket key rides it for free — the batch
  * equivalent of the reference's keyed Redis layout
  * (services/flink-jobs/.../FeatureStore.java keyBy state: state
  * lives pre-partitioned by entity so lookups never re-shuffle).
  *
  * Bucketed writes go through the session catalog (`saveAsTable` —
  * parquet + bucket metadata in the metastore); `BucketingSpec`
  * proves the no-Exchange plan and result parity with the shuffle
  * join.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table on `key` (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with matching bucket
    * counts. The plan this produces must contain no Exchange — that
    * is the point, and the spec asserts it.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
