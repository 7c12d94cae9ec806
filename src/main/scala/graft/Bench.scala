package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every SparkEntry query on the sf dir named
  * by SPARK_GRAFT_SF_DIR and emits ONE JSON line.
  *
  * The JSON is (a) written to the file named by SPARK_GRAFT_BENCH_OUT
  * (default `BENCH.json` in the working directory) and (b) printed as
  * the final stdout line — the driver may consume either. Query
  * failures are NOT folded into the timings: a query that fails both
  * runs is reported under `"errors"` with its exception and excluded
  * from `"queries"`/`"value"`; a query that fails exactly one run
  * keeps its surviving timing AND gets a `"flaky (run N)"` entry in
  * `"errors"`. Any `"errors"` entry flips the process exit code.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Each query runs twice; the min is reported. Run 1 pays one-time
    // Janino codegen + plan analysis + broadcast builds (constant cost,
    // amortized away at scale); run 2 is the steady-state per-query
    // time a cluster run would see. Measured: q_ann_lsh 5.5s cold vs
    // 0.93s steady on identical data.
    val timings = Seq.newBuilder[(String, Double)]
    val errors = Seq.newBuilder[(String, String)]
    // optional comma-separated filter for local iteration on a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      }
      (once(), once()) match {
        case (Right(a), Right(b)) => timings += name -> math.min(a, b)
        // a query that fails on exactly one run is FLAKY — keep the
        // surviving timing but surface the error too, so
        // nondeterministic breakage is never masked by a clean artifact
        case (Right(a), Left(err)) =>
          timings += name -> a; errors += name -> s"flaky (run 2): $err"
        case (Left(err), Right(b)) =>
          timings += name -> b; errors += name -> s"flaky (run 1): $err"
        case (Left(err), Left(_)) => errors += name -> err
      }
      // operators cache internal views (signatures, prepared vectors);
      // drop them between queries so the ~80×2 runs don't accumulate
      // executor storage until LRU eviction. releaseAll unpersists the
      // registered operator caches; clearCache stays as the catch-all.
      graft.operators.OperatorCaches.releaseAll()
      spark.catalog.clearCache()
    }
    val results = timings.result()
    val failed = errors.result()
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = failed.map { case (k, m) => s""""$k":"${esc(m)}"""" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"failed":${failed.size},"sf":"$sfDir","methodology":"min of 2 runs per query (steady-state; run 1 pays one-time codegen, broadcast builds, and operator-internal caches)"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    // The driver captures only the last 2000 BYTES of stdout (BENCH_r03
    // "tail" is 2000 chars and starts mid-line, so the full per-query
    // map never parses). Print a COMPACT line — total + the slowest 20
    // queries at 3 dp — guaranteed to fit the capture window; the
    // complete map lives in the file written above.
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    def compactLine(n: Int): String = {
      val slowest = results.sortBy(-_._2).take(n)
        .map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$slowest,"queries_run":${results.size},"failed":${failed.size},"sf":"$sfDir","full_results":"$outPath"}"""
    }
    // hard guarantee the line fits the driver's capture window even if
    // query names grow: shrink the slowest-N list until it does
    val compact = (20 to 0 by -5).map(compactLine).find(_.length <= 1800)
      .getOrElse(compactLine(0))
    // last stdout line, bare (build.sbt sets run/outputStrategy :=
    // StdoutOutput so sbt does not prefix it with [info])
    println(compact)
    if (failed.nonEmpty) sys.exit(2)
  }
}
