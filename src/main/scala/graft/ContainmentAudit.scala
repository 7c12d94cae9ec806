package graft

import org.apache.spark.sql.{Observation, SparkSession}

import graft.operators.Dedup
import graft.sources.Tables

/** Measures both forms of [[Dedup.containmentPairs]] on one SF dir:
  * steady-state seconds plus the candidate audit (`n_candidates`,
  * `n_join_rows`) for the prefix-filtered and the direct self-join
  * path — the numbers behind the size gate
  * ([[Dedup.ContainmentPrefixMinDocs]]), recorded in COVERAGE.md.
  * Usage: `runMain graft.ContainmentAudit [sfDir]`.
  */
object ContainmentAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val docs = Tables(spark, sfDir, "documents")
    Seq(true, false).foreach { prefix =>
      def once(withAudit: Boolean): (Double, Option[(Long, Long)]) = {
        val obs = if (withAudit) Some(new Observation()) else None
        val t0 = System.nanoTime()
        Dedup.containmentPairs(docs, threshold = 0.8, audit = obs,
          prefixFilter = Some(prefix)).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.operators.OperatorCaches.releaseAll()
        spark.catalog.clearCache()
        (sec, obs.map(o => (o.get("n_candidates").asInstanceOf[Long],
          o.get("n_join_rows").asInstanceOf[Long])))
      }
      val (_, audit) = once(withAudit = true) // cold + audit numbers
      val steady = (1 to 3).map(_ => once(withAudit = false)._1).min
      val (nc, nj) = audit.get
      println(f"CONTAINMENT prefix=$prefix%-5s steady=$steady%.3f s " +
        f"n_candidates=$nc n_join_rows=$nj sf=$sfDir")
    }
    spark.stop()
  }
}
