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
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
