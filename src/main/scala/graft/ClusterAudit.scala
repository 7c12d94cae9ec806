package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.sources.Tables

/** Stage-by-stage timing of the simhash-cluster pass (the engine's
  * most expensive operator family: `q_dedup_clusters`,
  * `q_split_leakage`, `q_cluster_split` all ride it). Prints steady
  * seconds for: signatures, LSH block pairs, connected components
  * (with round count), and the full clusters operator.
  * Usage: `runMain graft.ClusterAudit [sfDir]`.
  */
object ClusterAudit {
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
    def timed(label: String)(f: => Long): Unit = {
      f // cold
      graft.operators.OperatorCaches.releaseAll(); spark.catalog.clearCache()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        graft.operators.OperatorCaches.releaseAll(); spark.catalog.clearCache()
        (s, n)
      }
      println(f"CLUSTER ${label}%-14s steady=${runs.map(_._1).min}%.3f s rows=${runs.head._2}")
    }
    timed("simhash") { Bench.force(Dedup.simhash(docs)) }
    timed("pairs") { Bench.force(Dedup.simhashPairs(docs)) }
    val audit = new Dedup.CcAudit
    timed("cc_only") {
      val sig = Dedup.simhash(docs)
      val reps = sig.groupBy("simhash")
        .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
      val pairs = Dedup.simhashPairs(docs).select("doc_a", "doc_b")
      Bench.force(Dedup.connectedComponents(pairs,
        reps.select("doc_id"), "doc_id", Some(audit)))
    }
    println(s"CLUSTER cc_rounds      ${audit.rounds}")
    timed("clusters_full") { Bench.force(Dedup.simhashClusters(docs)) }
    spark.stop()
  }
}
