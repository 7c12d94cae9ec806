package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{OperatorCaches, Similarity}

/** Recall decomposition for the trained-rerank serving stack: isolates
  * the coarse-quantizer role from the PQ-codebook role of the
  * sample-trained book at each nprobe, across training depths (1 vs 3
  * Lloyd rounds) and training corpora (25% sample vs full). This is
  * the measurement behind q_ann_trained_rerank's one-round choice —
  * results table in COVERAGE.md's round-11 log. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RecallDiag"
  */
object RecallDiag {
  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("neighbor_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def recallOf(ann: DataFrame, truth: Map[Long, Set[Long]], k: Int): Double = {
    val got = topkSets(ann)
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / k }
    per.sum / per.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qPred = col("vec_id") < 64
    val k = 10
    val truth = topkSets(Similarity.bruteForceTopK(emb, qPred, k))
    OperatorCaches.releaseAll()

    val sample = emb.filter(pmod(col("vec_id"), lit(4L)) === 0)
    val s3 = Similarity.kmeansCarr(sample, k = 16, iters = 3).localCheckpoint(true)
    val s3p = Similarity.carrToPivotArr(s3).localCheckpoint(true)
    val s1 = Similarity.kmeansCarr(sample, k = 16, iters = 1).localCheckpoint(true)
    val s1p = Similarity.carrToPivotArr(s1).localCheckpoint(true)
    val f1 = Similarity.kmeansCarr(emb, k = 16, iters = 1).localCheckpoint(true)
    val f1p = Similarity.carrToPivotArr(f1).localCheckpoint(true)
    OperatorCaches.releaseAll()

    val variants: Seq[(String, Option[DataFrame], Option[DataFrame])] = Seq(
      ("baseline_first16", None, None),
      ("s3_both", Some(s3p), Some(s3)),
      ("s3_coarse_only", Some(s3p), None),
      ("s3_pq_only", None, Some(s3)),
      ("s1_both", Some(s1p), Some(s1)),
      ("f1_both", Some(f1p), Some(f1)))
    println("variant,nprobe,recall_at_10")
    for (nprobe <- Seq(1, 2, 4, 8); (name, pv, bk) <- variants) {
      val r = recallOf(Similarity.ivfPqRerankTopK(emb, qPred, k, rerank = 40,
        nprobe = nprobe, pivotsOpt = pv, bookOpt = bk), truth, k)
      OperatorCaches.releaseAll()
      println(f"$name,$nprobe,$r%.4f")
    }
    spark.stop()
  }
}
