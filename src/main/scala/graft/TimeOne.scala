package graft

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: `runMain graft.TimeOne <name> [sfDir]`.
  * Same session config as Bench; prints cold + steady-state seconds.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      Bench.force(fn(spark, sfDir)) // full-plan forcing, not count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val warm = (1 to 3).map(_ => once()).min
    println(f"TIMEONE $name cold=$cold%.3f steady=$warm%.3f sf=$sfDir")
    spark.stop()
  }
}
