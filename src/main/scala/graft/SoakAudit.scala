package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.streaming.{CurationLoop, StreamClusters}

/** End-to-end curation-loop soak at bench scale: the documents corpus
  * is produced into a graftlog, streamed back through the DSv2 source
  * in ~`SOAK_BATCHES` admission-paced micro-batches, and folded
  * through [[CurationLoop.Runner]] (classify → edges → incremental
  * clusters → index growth, consolidation on schedule). Per batch it
  * records wall time and the records actually read by the tagged
  * index-maintenance jobs; at the end it checks the maintained labels
  * against the full batch connected-components fixpoint.
  *
  * The per-batch O(|batch|) contract is stage-metrics-pinned on small
  * fixtures in StreamingSpec; this audit is the SCALE-SOAK evidence —
  * if any per-batch step secretly scaled with the corpus, the
  * per-batch wall/read series would trend up across ~50 batches of a
  * growing corpus. Flatness statistic: mean of the last quarter vs
  * mean of the second quarter (the first quarter pays JIT/codegen
  * warmup), bounded at 1.8×.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.SoakAudit"   # writes SOAK.json
  */
object SoakAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "SOAK.json")
    val targetBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "50").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val total = docs.count()
    val perTrigger = math.max(1L, (total + targetBatches - 1) / targetBatches)

    // produce the corpus into a fresh graftlog (keyed by doc_id)
    val root = Files.createTempDirectory("graft_soak").toFile.getAbsolutePath
    val logDir = s"$root/log"
    graft.sources.log.GraftLog.write(
      docs.select(col("doc_id").cast("string").as("key"),
        to_json(struct(col("doc_id"), col("text"))).as("value")),
      logDir, partitions = 8)

    // tagged-maintenance read counter (same audit surface as
    // StreamingSpec's O(batch) pin)
    val stageIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val maintReads = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null && CurationLoop.MaintainJobGroup ==
            js.properties.getProperty("spark.jobGroup.id"))
          js.stageIds.foreach(id => stageIds.add(id))
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (stageIds.contains(sc.stageInfo.stageId)) {
          val m = sc.stageInfo.taskMetrics
          maintReads.addAndGet(
            m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val wireSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val runner = new CurationLoop.Runner(spark, consolidateEvery = 10)
    val wallMs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val reads = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]

    def settle(): Long = { // listener bus is async: wait until stable
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = -1L
      while (System.nanoTime() < deadline && maintReads.get() != last) {
        last = maintReads.get(); Thread.sleep(150)
      }
      last
    }

    val q = spark.readStream.format("graftlog").option("path", logDir)
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", perTrigger.toString).load()
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val db = batch
          .select(from_json(col("value").cast("string"), wireSchema).as("r"))
          .select("r.doc_id", "r.text")
        val before = settle()
        val t0 = System.nanoTime()
        runner.sink(db, batchId)
        val t1 = System.nanoTime()
        val after = settle()
        wallMs += (t1 - t0) / 1e6
        reads += (after - before)
        sizes += db.count()
        (): Unit
      }
      .start()
    q.processAllAvailable(); q.stop()
    spark.sparkContext.removeSparkListener(listener)

    // final-label parity vs the batch fixpoint over the full corpus
    val expect = Dedup.connectedComponents(
        Dedup.minhashCandidates(docs), docs.select("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.OperatorCaches.releaseAll()
    val got = StreamClusters.labelsFor(runner.state().clusters, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parity = got == expect

    val n = wallMs.size
    def quarterMean(xs: Seq[Double], qi: Int): Double = {
      val qn = math.max(1, n / 4)
      val slice = xs.slice(qi * qn, math.min(n, (qi + 1) * qn))
      slice.sum / slice.size
    }
    val wallTrend = quarterMean(wallMs.toSeq, 3) / quarterMean(wallMs.toSeq, 1)
    val readTrend = quarterMean(reads.map(_.toDouble).toSeq, 3) /
      math.max(1.0, quarterMean(reads.map(_.toDouble).toSeq, 1))
    val flat = wallTrend <= 1.8 && readTrend <= 1.8

    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.1f").mkString("[", ",", "]")
    val json =
      s"""{"metric":"curation_soak","sf":"$sfDir","docs":$total,"batches":$n,""" +
      s""""per_trigger":$perTrigger,"consolidations":${runner.consolidationCount},""" +
      s""""wall_ms":${arr(wallMs.toSeq)},"maint_reads":${reads.mkString("[", ",", "]")},""" +
      s""""batch_sizes":${sizes.mkString("[", ",", "]")},""" +
      f""""wall_trend_q4_over_q2":$wallTrend%.3f,"read_trend_q4_over_q2":$readTrend%.3f,""" +
      s""""label_parity":$parity,"flat":$flat}"""
    Files.write(java.nio.file.Paths.get(outPath), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!parity || !flat) sys.exit(1)
  }
}
