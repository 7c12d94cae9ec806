package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Sub-plan timing probes for optimization work: names a STAGE of a
  * declared query (the simhash pass alone, the CC fixpoint alone, one
  * ANN rung alone) so a slow query can be attributed to the stage that
  * owns the time instead of guessed at. Same session config and
  * forcing as [[Bench]]; prints cold + min-of-3 steady seconds per
  * probe.
  *
  * `runMain graft.OptProbe <probe>[,<probe>...] [sfDir]`, probe `all`
  * runs everything. Diagnostic only — never part of the driver
  * surface; results guide the round-16 optimization log.
  */
object OptProbe {
  def probes: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- cluster-family decomposition (q_dedup_clusters et al.) ----
    "p_simhash" -> ((s, d) => Dedup.simhash(T(s, d)("documents"))),
    "p_sig_reps" -> ((s, d) => {
      val sig = Dedup.simhash(T(s, d)("documents"))
      sig.groupBy("simhash").agg(min("doc_id").as("doc_id"))
    }),
    "p_rep_pairs" -> ((s, d) =>
      Dedup.simhashPairs(T(s, d)("documents"))),
    "p_clusters" -> ((s, d) => Dedup.simhashClusters(T(s, d)("documents"))),
    // ---- ANN ladder decomposition ----
    "p_prepared" -> ((s, d) =>
      T(s, d)("embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))),
    "p_truth" -> ((s, d) =>
      Similarity.bruteForceTopK(T(s, d)("embeddings"), col("vec_id") < 8, 3)),
    "p_ivf" -> ((s, d) =>
      Similarity.ivfTopK(T(s, d)("embeddings"), col("vec_id") < 8, 3)),
    "p_ivfpq" -> ((s, d) =>
      Similarity.ivfPqTopK(T(s, d)("embeddings"), col("vec_id") < 8, 3)),
    "p_lsh" -> ((s, d) =>
      Similarity.lshTopK(T(s, d)("embeddings"), col("vec_id") < 8, 3))
  )

  private def T(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables(s, dir, name)

  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty || args(0) == "all") probes.keys.toSeq.sorted
      else args(0).split(",").toSeq
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
    names.foreach { n =>
      val fn = probes.getOrElse(n, SparkEntry.queries(n))
      def once(): Double = {
        val t0 = System.nanoTime()
        Bench.force(fn(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        graft.operators.OperatorCaches.releaseAll()
        spark.catalog.clearCache()
        t
      }
      val cold = once()
      val steady = (1 to 3).map(_ => once()).min
      println(f"OPTPROBE $n cold=$cold%.3f steady=$steady%.3f sf=$sfDir")
    }
    spark.stop()
  }
}
