package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Diagnostic: jobs/stages/tasks per named query — the deterministic
  * driver-overhead metric wall-clock noise cannot fake. r16 only.
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_dedup_clusters").split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        val i = sc.stageInfo
        val dur = (for (a <- i.completionTime; b <- i.submissionTime)
          yield (a - b) / 1000.0).getOrElse(-1.0)
        stageLog.add((i.name.takeWhile(_ != '\n').take(70), dur, i.numTasks))
      }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm run
      Bench.force(fn(spark, sfDir))
      graft.operators.OperatorCaches.releaseAll()
      spark.catalog.clearCache()
      Thread.sleep(500)
      jobs.set(0); stages.set(0); tasks.set(0); stageLog.clear()
      val t0 = System.nanoTime()
      Bench.force(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"JOBCOUNT $n jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} wall=$wall%.2f")
      if (sys.env.contains("SPARK_GRAFT_STAGE_DETAIL")) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.toSeq.sortBy(-_._2).take(8).foreach {
          case (nm, dur, nt) =>
            println(f"  STAGE $dur%6.2fs tasks=$nt%-4d $nm")
        }
      }
      graft.operators.OperatorCaches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
