package graft.sources

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard. The driver's test tables are single-file,
  * single-row-group parquet — unsplittable, so any map-heavy pipeline
  * (shingling, per-pair cosine, regex) runs in ONE task regardless of
  * executor count. `fan` round-robin-repartitions only when the
  * current scan parallelism is below the session default, so on a
  * real cluster (many files / row groups, scan parallelism already ≥
  * cores) it is a no-op and never injects a gratuitous shuffle.
  */
object Par {
  def fan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // partition count via the internal-row RDD lineage (lazy metadata,
    // no job): avoids df.rdd's per-call deserializer plan conversion
    val current = df.queryExecution.toRdd.getNumPartitions
    if (current < target) df.repartition(target) else df
  }
}
