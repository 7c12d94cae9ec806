package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Benchmark harness: times every SparkEntry query on the sf dir named
  * by SPARK_GRAFT_SF_DIR and emits ONE JSON line.
  *
  * The JSON is (a) written to the file named by SPARK_GRAFT_BENCH_OUT
  * (default `BENCH.json` in the working directory) and (b) printed as
  * the final stdout line — the driver may consume either.
  *
  * == Contention resistance ==
  * A shared box can run ambient load for minutes at a time, long enough
  * to contaminate BOTH runs of a min-of-2 measurement (observed: two
  * alphabetically-contiguous windows of a sequential run reading
  * 10-60x slow while every other query matched clean values to within
  * noise). The harness therefore audits itself:
  *
  *  1. every per-run wall time is recorded (`"runs"`), not just the
  *     aggregate, so slow readings are distinguishable from slow code;
  *  2. 1-minute loadavg is sampled before and after every query
  *     (`"load"`) — a spike correlated with a slow reading is ambient
  *     load, not a regression;
  *  3. if the two runs disagree by >3x, a third evidence run is
  *     taken; the value is the min of all runs (one-sided noise);
  *  4. if a committed reference file (`BENCH_REF.json`, overridable via
  *     SPARK_GRAFT_BENCH_REF) knows this query and the reading is still
  *     >5x the reference, up to two spaced retry runs attempt a clean
  *     reading (contamination only ever inflates, so taking the min of
  *     retries is sound); a query that stays >5x after retries is
  *     listed in `"suspect"` with its reference value alongside;
  *  5. a RUN-level gate catches the uniform drift the per-query
  *     threshold cannot see (observed: every query ~1.35x slow under
  *     ambient load, zero suspects): if the suspect-substituted total
  *     exceeds 1.25x the reference total — normalized by the relative
  *     host speed, measured by a built-in md5 calibration carried in
  *     the artifact (`cpu_1t`), because rounds land on
  *     different-speed hosts — one full extra pass
  *     re-measures every query (min is sound — contention only
  *     inflates), and a run still over the gate is stamped
  *     `"run_suspect": true` so no contended artifact can present
  *     itself as clean again.
  *
  * Query failures are NOT folded into the timings: a query that fails
  * every attempt is reported under `"errors"` and excluded from
  * `"queries"`/`"value"`; a query that fails some attempts keeps its
  * surviving timing AND gets a `"flaky"` entry in `"errors"`. Any
  * `"errors"` entry flips the process exit code.
  */
object Bench {
  /** Force FULL materialization of the query's committed physical
    * plan. `df.count()` built a NEW logical plan (Aggregate(count(1))
    * over the query) that Catalyst then optimized: column pruning
    * dropped every deterministic projected expression (a projection-
    * heavy query timed as a bare scan) and unique-key left joins were
    * eliminated outright — measured r15: the stride-1 substring
    * profile "cost" 0.2 s via count() at 100× vs 230.7 s under this
    * forcing (327 s via a sum-forced probe — the first evidence the
    * count() number was fiction). Executing the query's OWN physical plan via toRdd
    * computes every output column of every row — the cost a caller
    * writing the result anywhere would pay — and that is the number
    * the bench claims to measure.
    */
  private[graft] def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** 1-minute loadavg from /proc/loadavg; -1 where unreadable. */
  private def load1(): Double =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      s.split("\\s+")(0).toDouble
    } catch { case _: Throwable => -1.0 }

  /** (busy, total) jiffies summed over all host CPUs from /proc/stat.
    * busy excludes idle+iowait; steal counts as busy — a hypervisor
    * stealing our cycles IS foreign load.
    */
  private[graft] def readSystemJiffies(): (Long, Long) = {
    val line = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).get
    val f = line.trim.split("\\s+").drop(1).map(_.toLong)
    val total = f.sum
    val idle = f(3) + (if (f.length > 4) f(4) else 0L)
    (total - idle, total)
  }

  /** This process's utime+stime jiffies from /proc/self/stat (whole
    * JVM, all threads). The comm field can contain spaces/parens —
    * parse after the LAST ')'.
    */
  private[graft] def readSelfJiffies(): Long = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
    val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
    rest(11).toLong + rest(12).toLong  // fields 14 (utime), 15 (stime)
  }

  /** Host CPU count = cpuN lines in /proc/stat (NOT
    * availableProcessors, which can be cgroup-clamped below the host
    * width that /proc/stat jiffies are denominated in).
    */
  private[graft] def hostCpus(): Int =
    scala.io.Source.fromFile("/proc/stat").getLines()
      .count(l => l.startsWith("cpu") && !l.startsWith("cpu "))

  /** Mid-run breach rule for the foreign-load gate: the run is
    * suspect when the MEAN foreign-core occupancy over the suite
    * exceeds the ceiling (a short cron blip shouldn't kill a run; a
    * co-tenant camped on cores for the duration must).
    */
  private[graft] def foreignBreach(samples: Seq[Double],
                                   maxMeanCores: Double): Boolean =
    samples.nonEmpty &&
      samples.sum / samples.size > maxMeanCores

  /** Foreign-CPU sampler (round-12 verdict item 4). The r12 official
    * artifact started at loadavg 1.64 (passing the start gate), ended
    * at 11.53, drifted 1.248 — 0.002 under the retry trigger — and
    * stamped itself clean: the start-only gate is blind to co-tenants
    * arriving MID-run, and raw loadavg cannot police the middle of a
    * run because this bench's own local[32] JVM legitimately drives
    * loadavg past 10 (clean p2 pass: median mid-query loadavg 10.17).
    * What loadavg conflates, CPU accounting separates: every 5s a
    * daemon thread diffs system-wide busy jiffies against THIS
    * process's jiffies — the remainder is, by construction, other
    * tenants (plus kernel threads, ~0 idle). The artifact carries
    * mean/peak foreign cores; a mean above SPARK_GRAFT_FOREIGN_MAX
    * (default 2.0 cores) stamps "midrun_load_breach": true and folds
    * into run_suspect, so a co-tenanted run can never present itself
    * clean again regardless of where in the run the tenant arrived.
    */
  private[graft] final class ForeignLoadSampler(periodMs: Long = 5000L) {
    private val samples = scala.collection.mutable.ArrayBuffer[Double]()
    @volatile private var stopped = false
    private val cpus = hostCpus()
    private val t = new Thread(() => {
      try {
        var (b0, t0) = readSystemJiffies()
        var s0 = readSelfJiffies()
        while (!stopped) {
          Thread.sleep(periodMs)
          val (b1, t1) = readSystemJiffies()
          val s1 = readSelfJiffies()
          val dt = t1 - t0
          if (dt > 0) {
            val foreign =
              math.max(0.0, ((b1 - b0) - (s1 - s0)).toDouble / dt * cpus)
            samples.synchronized { samples += foreign }
          }
          b0 = b1; t0 = t1; s0 = s1
        }
      } catch { case _: Throwable => () }  // sampler must never kill a run
    }, "bench-foreign-load-sampler")
    t.setDaemon(true)
    t.start()

    /** Stop sampling; the foreign-core samples in order. */
    def finish(): Vector[Double] = {
      stopped = true
      t.interrupt()
      samples.synchronized { samples.toVector }
    }
  }

  /** Fixed CPU calibration: seconds for a deterministic md5 chain,
    * single-thread and one-thread-per-core. The rounds of this build
    * land on different hosts: round 7 measured a UNIFORM ~1.6x
    * per-query drift vs the committed reference on a verified-idle
    * box (zero foreign processes, 0.19% steal) — host speed, not
    * contention, and indistinguishable from a code-wide regression
    * without a yardstick that depends on the host alone. These two
    * numbers are that yardstick: they ride in the artifact, and the
    * drift gate normalizes by the single-thread ratio when the
    * reference file carries one.
    */
  private def cpuCalibration(cpus: Int): (Double, Double) = {
    def work(): Unit = {
      val md = java.security.MessageDigest.getInstance("MD5")
      var b = new Array[Byte](64)
      var i = 0
      while (i < 400000) { b = md.digest(b); i += 1 }
    }
    work(); work() // JIT warm-up (two passes: C2 kicks in late)
    // min of 3: single measured readings vary ~20% from JIT/alloc
    // noise, which would leak straight into the gate's host factor
    val single = (1 to 3).map { _ =>
      val t1 = System.nanoTime(); work()
      (System.nanoTime() - t1) / 1e9
    }.min
    val threads = (1 to cpus).map(_ => new Thread(() => work()))
    val t2 = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    val par = (System.nanoTime() - t2) / 1e9
    (single, par)
  }

  /** Single-thread small-string allocation + hash-grouping probe —
    * the regime the explode-family queries stress (tokenize → many
    * short-lived strings → map-side partial aggregation), which the
    * md5 digest probe above cannot see: the r12 cross-box forensics
    * found five explode-heavy queries reading 1.4–2.0× anchor on a
    * box whose md5 probe read FASTER than the anchor box
    * (BENCH_TREND_r12.txt). Recorded as `cpu_alloc` in the artifact
    * and — since r14, with a reference baseline in BENCH_REF.json —
    * blended into host_factor by [[hostFactorOf]] (r13 verdict #5;
    * the r13 fleet of passes established the probe's idle-window
    * range, 0.088–0.098 at host_factor 1.0, before folding it in).
    */
  private def allocCalibration(): Double = {
    def work(): Long = {
      val m = new java.util.HashMap[String, Long](1 << 16)
      var acc = 0L
      var i = 0
      while (i < 1500000) {
        val s = "tok" + (i % 65536) + "x"
        val prev = m.getOrDefault(s, 0L)
        m.put(s, prev + 1L)
        acc += s.length
        i += 1
      }
      acc + m.size
    }
    work(); work() // JIT warm-up, same discipline as cpuCalibration
    (1 to 3).map { _ =>
      val t = System.nanoTime(); work(); (System.nanoTime() - t) / 1e9
    }.min
  }

  /** Per-query reference timings from a previously committed clean run.
    * The file is the harness's own output format; the `"queries"`
    * object is flat name->seconds, parsed with a regex (no nesting).
    * Whitespace-tolerant: the round-8 additive REF merge rewrote the
    * file through python json.dump, which emits `"queries": {` with a
    * space — the original exact-`"queries":{` probe missed it and the
    * whole drift gate silently disabled itself (reference parsed
    * empty, run_drift pinned at 1.0). Both key probes now accept
    * optional whitespace around the colon; BenchParseSpec pins both
    * spellings.
    */
  private[graft] def loadReference(path: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      "\"queries\"\\s*:\\s*\\{".r.findFirstMatchIn(txt) match {
        case None => Map.empty
        case Some(m) =>
          val body = txt.substring(m.end, txt.indexOf('}', m.end))
          "\"([A-Za-z0-9_]+)\"\\s*:\\s*([0-9.Ee+-]+)".r.findAllMatchIn(body)
            .map(g => g.group(1) -> g.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

  /** Single-thread calibration seconds from the reference file, if it
    * carries one (refreshed references do; see [[cpuCalibration]]).
    */
  private[graft] def loadRefCpu1t(path: String): Option[Double] =
    loadRefField(path, "cpu_1t")

  /** Allocation-probe calibration seconds from the reference file, if
    * it carries one (see [[allocCalibration]]; r14 BENCH_REF does).
    */
  private[graft] def loadRefCpuAlloc(path: String): Option[Double] =
    loadRefField(path, "cpu_alloc")

  private def loadRefField(path: String, name: String): Option[Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      topLevelNumber(txt, name)
    } catch { case _: Throwable => None }

  /** Numeric value of a TOP-LEVEL JSON key, found by a string-aware
    * depth scanner rather than a raw-text regex: BENCH_REF carries
    * provenance note strings, and a note that merely quotes a key like
    * `"cpu_alloc": 0.1` would have satisfied the old first-match regex
    * before (or instead of) the real field, silently shifting
    * host_factor. String literals are consumed whole (escapes
    * honoured), so quoted decoys inside notes can never surface as
    * keys; only a key at object depth 1 followed by `:` and a number
    * matches. BenchParseSpec pins a decoy-bearing fixture.
    */
  private[graft] def topLevelNumber(txt: String, name: String): Option[Double] = {
    val n = txt.length
    var i = 0
    var depth = 0
    while (i < n) {
      val c = txt.charAt(i)
      if (c == '"') {
        val start = i + 1
        i += 1
        while (i < n && txt.charAt(i) != '"') {
          if (txt.charAt(i) == '\\') i += 1
          i += 1
        }
        val content = if (i <= n) txt.substring(start, math.min(i, n)) else ""
        i += 1
        if (depth == 1 && content == name) {
          var j = i
          while (j < n && txt.charAt(j).isWhitespace) j += 1
          if (j < n && txt.charAt(j) == ':') {
            j += 1
            while (j < n && txt.charAt(j).isWhitespace) j += 1
            val k = j
            while (j < n && "0123456789.eE+-".indexOf(txt.charAt(j)) >= 0) j += 1
            if (j > k)
              try return Some(txt.substring(k, j).toDouble)
              catch { case _: NumberFormatException => }
          }
        }
      } else if (c == '{' || c == '[') { depth += 1; i += 1 }
      else if (c == '}' || c == ']') { depth -= 1; i += 1 }
      else i += 1
    }
    None
  }

  /** Host normalization factor for the drift gate (r13 verdict #5):
    * the MEAN of the available calibration ratios — md5 digest
    * (compute regime) and small-string alloc + hash-group (the
    * explode-family regime the md5 probe cannot see: r12 forensics
    * found explode queries 1.4–2× slow on a box whose md5 probe read
    * FASTER than the anchor) — floored at 1, so a faster host never
    * excuses a regression. The suite mixes both regimes roughly
    * evenly, hence the unweighted mean; with no reference cpu_alloc
    * the factor degrades to the pre-r14 md5-only ratio.
    */
  private[graft] def hostFactorOf(cpu1t: Double, refCpu1t: Option[Double],
      cpuAlloc: Double, refCpuAlloc: Option[Double]): Double = {
    val ratios = refCpu1t.map(cpu1t / _).toSeq ++
      refCpuAlloc.map(cpuAlloc / _).toSeq
    if (ratios.isEmpty) 1.0
    else math.max(1.0, ratios.sum / ratios.size)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "BENCH_REF.json")
    val reference = loadReference(refPath)
    // first calibration sample before the Spark session exists; a
    // second runs after the queries (see below) — early samples read
    // up to ~20% slow while the JIT compiler storm shares cores
    val (cpu1tStart, cpuMt) = cpuCalibration(cpus.toInt)
    val cpuAllocStart = allocCalibration()
    val refCpu1t = loadRefCpu1t(refPath)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // == Scaling legibility (r16 verdict item 2) ==
    // At sf0.1 the suite is driver-job-latency-bound: 198 queries in
    // ~130 s is ~0.66 s/query, most of it scheduling floor, so the
    // wall-clock 8c/32c ratio reads ≈1 even though the session honors
    // $SPARK_GRAFT_CPUS. The artifact must let a reader attribute that
    // flatness to its real cause, so a passive listener counts driver
    // jobs and tasks per query (from the min-time run) and the session
    // records its parallelism. onJobStart/onStageSubmitted both fire
    // BEFORE the work they announce, so by the time the synchronous
    // force() returns the counts are complete — no sleep, no wall cost.
    val jobsCtr = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasksCtr = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobsCtr.incrementAndGet()
        override def onStageSubmitted(
            ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          tasksCtr.addAndGet(ss.stageInfo.numTasks)
      })
    val qJobs = scala.collection.mutable.LinkedHashMap[String, Int]()
    val qTasks = scala.collection.mutable.LinkedHashMap[String, Int]()
    // == Start-of-run load defense (round-12 verdict item 3) ==
    // Two consecutive driver rounds produced official artifacts from a
    // box at loadavg 5.8–7.6 (co-tenant load): per-query retries can
    // rescue individual readings but not a whole contended suite.
    // Refuse to start measuring on a visibly loaded box — poll up to
    // SPARK_GRAFT_LOAD_WAIT_SECS (default 600) for the 1-minute
    // loadavg to fall below SPARK_GRAFT_LOAD_MAX (default 2.0). A run
    // that must start loaded anyway is stamped "invalid_load": true in
    // the artifact, so a contended run can never present itself clean.
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX", "2.0").toDouble
    val loadWaitSecs =
      sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_SECS", "600").toInt
    val waitDeadline = System.nanoTime() + loadWaitSecs * 1000000000L
    while (load1() > loadMax && System.nanoTime() < waitDeadline) {
      System.err.println(
        s"[bench] 1-min loadavg ${load1()} > $loadMax — waiting for idle")
      Thread.sleep(15000)
    }
    val loadStart = load1()
    val invalidLoad = loadStart > loadMax
    // mid-run co-tenancy watch: foreign = system CPU minus own CPU
    val foreignMax =
      sys.env.getOrElse("SPARK_GRAFT_FOREIGN_MAX", "2.0").toDouble
    val foreignSampler = new ForeignLoadSampler()
    // Each query runs at least twice. Run 1 pays one-time Janino
    // codegen + plan analysis + broadcast builds (constant cost,
    // amortized away at scale); run 2 is the steady-state per-query
    // time a cluster run would see. Measured: q_ann_lsh 5.5s cold vs
    // 0.93s steady on identical data.
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = Seq.newBuilder[(String, String)]
    val allRuns = scala.collection.mutable.LinkedHashMap[String, ArrayBuffer[Double]]()
    val loads = Seq.newBuilder[(String, (Double, Double))]
    val suspects = Seq.newBuilder[(String, Double, Double)] // name, value, ref
    // optional comma-separated filter for local iteration on a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val benchQueries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    benchQueries
      .foreach { case (name, fn) =>
        // (seconds, driver jobs, tasks) per run; the artifact keeps
        // the counts of the MIN-time run (steady state — run 1's extra
        // cache-fill jobs are the warm-up the min already excludes)
        def once(): Either[String, (Double, Int, Int)] = {
          val j0 = jobsCtr.get(); val k0 = tasksCtr.get()
          val t0 = System.nanoTime()
          try {
            force(fn(spark, sfDir))
            Right(((System.nanoTime() - t0) / 1e9,
              jobsCtr.get() - j0, tasksCtr.get() - k0))
          } catch {
            case e: Throwable =>
              Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          }
        }
        val lBefore = load1()
        val ok = ArrayBuffer[Double]()
        val okMeta = ArrayBuffer[(Int, Int)]()
        val bad = ArrayBuffer[String]()
        def attempt(): Unit = once() match {
          case Right((t, j, k)) => ok += t; okMeta += ((j, k))
          case Left(e)          => bad += e
        }
        attempt(); attempt()
        // >3x disagreement between the two runs: one of them is
        // contaminated — take a third sample for evidence. The value
        // is then the MIN of all samples, not the median: r15 idle
        // forensics (BENCH_TREND_r15.txt) showed the >3x trigger fires
        // almost exclusively because run 1 paid codegen/cache builds,
        // and the median of [fast, comparable, codegen-heavy] returns
        // the SLOWER of the two comparable runs — at true idle
        // (foreign_mean 0.003) this alone stamped warm-fast queries
        // 2-3x over anchor. Wall noise is one-sided (contention and
        // cold caches only ever inflate; the work cannot run faster
        // than the code allows), so min is the sound estimator — the
        // same axiom every retry path here already states.
        if (ok.size == 2 && ok.max / math.max(ok.min, 1e-9) > 3.0) attempt()
        var value = if (ok.nonEmpty) ok.min else Double.NaN
        // Reference-guided retry: a reading far above the committed
        // clean value is almost certainly ambient load (code changes
        // land with their own updated reference). Retries are spaced
        // so a short contention burst can pass; min is sound because
        // contention only inflates.
        reference.get(name).foreach { ref =>
          var extra = 0
          while (!value.isNaN && value > 5 * ref && extra < 2) {
            Thread.sleep(500); attempt(); extra += 1
            if (ok.nonEmpty) value = math.min(value, ok.last)
          }
          if (!value.isNaN && value > 5 * ref) suspects += ((name, value, ref))
        }
        val lAfter = load1()
        if (ok.nonEmpty) {
          timings(name) = value
          val (mj, mk) = okMeta(ok.indexOf(value))
          qJobs(name) = mj; qTasks(name) = mk
          if (bad.nonEmpty) errors += name -> s"flaky (${bad.size} failed attempt(s)): ${bad.head}"
        } else errors += name -> bad.head
        allRuns(name) = ok
        loads += name -> (lBefore, lAfter)
        // operators cache internal views (signatures, prepared vectors);
        // drop them between queries so the ~120x2 runs don't accumulate
        // executor storage until LRU eviction. releaseAll unpersists the
        // registered operator caches; clearCache stays as the catch-all.
        graft.operators.OperatorCaches.releaseAll()
        spark.catalog.clearCache()
      }
    // ONE extra timed run of an already-measured query, shared by the
    // targeted requeue and the run-level drift gate: min-folds into
    // timings (contention only inflates, so min is sound), appends to
    // the per-query run log, releases operator caches; a NON-fatal
    // error keeps the surviving reading (fatal ones — OOM, interrupt
    // — propagate: continuing the suite in a broken JVM would record
    // garbage as truth).
    def remeasure(name: String,
                  fn: (org.apache.spark.sql.SparkSession,
                       String) => org.apache.spark.sql.DataFrame): Unit = {
      val j0 = jobsCtr.get(); val k0 = tasksCtr.get()
      val t0 = System.nanoTime()
      try {
        force(fn(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        allRuns(name) += t
        if (t < timings(name)) {
          timings(name) = t
          qJobs(name) = jobsCtr.get() - j0
          qTasks(name) = tasksCtr.get() - k0
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] remeasure $name failed, " +
            s"keeping prior reading: $e")
      }
      graft.operators.OperatorCaches.releaseAll()
      spark.catalog.clearCache()
    }
    // == Targeted end-of-suite requeue (round-12 verdict item 3) ==
    // A query still reading ≥2x its committed reference after the
    // in-flight retries gets ONE more run here, after whatever
    // contended with it has had the rest of the suite to pass.
    // Cheaper than the full drift-gate pass and catches localized
    // contention bursts the run-level gate's 1.25x total threshold
    // cannot see.
    benchQueries.foreach { case (name, fn) =>
      if (timings.contains(name) &&
          reference.get(name).exists(r => timings(name) > 2 * r))
        remeasure(name, fn)
    }
    val failed = errors.result()
    // == Run-level drift gate (round-6 verdict item 1) ==
    // The per-query 5x suspect threshold is blind to UNIFORM ambient
    // drift: observed round 6, every query ~1.35x slow under ~6 cores
    // of ambient load, one suspect flagged, artifact presented as
    // clean. Judge the RUN against the committed reference: over
    // queries both sides know, effective-total / reference-total
    // (per-query suspects substituted, same rule as clean_total). If
    // the ratio exceeds 1.25x, ONE full extra pass re-measures every
    // query (contention only inflates, so min is sound); a run still
    // above the gate after that pass is stamped "run_suspect": true —
    // the loadavg evidence is already in "load"/"load_start".
    // end-of-run calibration sample: the JVM is fully warm and idle
    // between queries, so min(start, end) is the host's real speed
    val cpu1t = math.min(cpu1tStart, cpuCalibration(cpus.toInt)._1)
    val cpuAlloc = math.min(cpuAllocStart, allocCalibration())
    // a slower host inflates every query by ~the calibration ratio;
    // never scale BELOW 1 (a faster host must not excuse a regression)
    val hostFactor =
      hostFactorOf(cpu1t, refCpu1t, cpuAlloc, loadRefCpuAlloc(refPath))
    val refJoint = timings.keys.filter(reference.contains).toSeq
    val refJointTotal = refJoint.map(reference).sum
    def effective(k: String): Double = {
      val v = timings(k); val r = reference(k)
      if (v > 5 * r) r else v
    }
    def driftNow(): Double =
      if (refJoint.isEmpty || refJointTotal <= 0) 1.0
      else refJoint.map(effective).sum / refJointTotal
    var runRetried = false
    if (driftNow() / hostFactor > 1.25) {
      runRetried = true
      benchQueries.foreach { case (name, fn) =>
        if (timings.contains(name)) remeasure(name, fn)
      }
    }
    val runDrift = driftNow()
    val runDriftNorm = runDrift / hostFactor
    // stop the co-tenancy sampler only after the drift-gate pass and
    // requeues — a tenant arriving during the remedial passes counts
    val foreignSamples = foreignSampler.finish()
    val foreignMean =
      if (foreignSamples.isEmpty) 0.0
      else foreignSamples.sum / foreignSamples.size
    val foreignPeak = if (foreignSamples.isEmpty) 0.0 else foreignSamples.max
    val midrunBreach = foreignBreach(foreignSamples, foreignMax)
    val runSuspect = (runRetried && runDriftNorm > 1.25) || midrunBreach
    // recompute per-query suspects from FINAL values: the drift-gate
    // pass may have produced a clean reading for a flagged query
    val suspectList = suspects.result()
      .map { case (k, _, ref) => (k, timings(k), ref) }
      .filter { case (_, v, ref) => v > 5 * ref }
    val results = timings.toSeq
    val loadEnd = load1()
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = failed.map { case (k, m) => s""""$k":"${esc(m)}"""" }
      .mkString("{", ",", "}")
    val runsJson = allRuns.toSeq
      .map { case (k, rs) => "\"" + k + "\":[" + rs.map(r3).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val loadJson = loads.result()
      .map { case (k, (a, b)) => "\"" + k + s"""\":[$a,$b]""" }
      .mkString("{", ",", "}")
    val suspectJson = suspectList
      .map { case (k, v, ref) => "\"" + k + s"""\":{"value":${r3(v)},"ref":$ref}""" }
      .mkString("{", ",", "}")
    val jobsJson = qJobs.toSeq.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val tasksJson = qTasks.toSeq.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val defaultPar = spark.sparkContext.defaultParallelism
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // total with suspect readings replaced by their committed reference
    // values — what this commit measures once ambient load is excluded
    val suspectNames = suspectList.map(_._1).toSet
    val cleanTotal = results.map { case (k, v) =>
      if (suspectNames(k)) reference(k) else v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cpus":$cpus,"default_parallelism":$defaultPar,"jobs":$jobsJson,"tasks":$tasksJson,"runs":$runsJson,"load":$loadJson,"load_start":$loadStart,"load_end":$loadEnd,"suspect":$suspectJson,"clean_total":${r3(cleanTotal)},"cpu_1t":${r3(cpu1t)},"cpu_mt":${r3(cpuMt)},"cpu_alloc":${r3(cpuAlloc)},"host_factor":${r3(hostFactor)},"run_drift":${r3(runDrift)},"run_drift_norm":${r3(runDriftNorm)},"run_retried":$runRetried,"run_suspect":$runSuspect,"invalid_load":$invalidLoad,"foreign_mean":${r3(foreignMean)},"foreign_peak":${r3(foreignPeak)},"foreign_n":${foreignSamples.size},"midrun_load_breach":$midrunBreach,"errors":$errJson,"failed":${failed.size},"sf":"$sfDir","methodology":"forcing = full materialization of the query plan via toRdd (r15; .count() let Catalyst prune projections and eliminate unique-key joins, under-measuring projection-heavy queries); min of 2 runs per query (run 1 pays one-time codegen/broadcast builds); >3x run disagreement -> third evidence run, value = min of all runs (r15: the median of [fast, comparable, codegen-heavy] returned the slower comparable run and stamped warm-fast queries 2-3x over anchor at true idle; wall noise is one-sided so min is sound); readings >5x the committed BENCH_REF.json value retried up to 2x spaced 500ms then flagged suspect (ambient-load audit: per-run times in runs, 1-min loadavg before/after each query in load); clean_total substitutes reference values for suspect readings; run-level gate: if suspect-substituted total exceeds 1.25x the reference total over jointly-known queries (normalized by host_factor = mean of this host's calibration ratios over the reference's - single-thread md5 cpu_1t and small-string alloc/hash-group cpu_alloc, the explode-family regime md5 cannot see - floored at 1; rounds land on different-speed hosts), one full extra pass re-measures every query (min taken), and a run still above the gate is stamped run_suspect; load defense: the run waits up to SPARK_GRAFT_LOAD_WAIT_SECS (default 600s) for 1-min loadavg <= SPARK_GRAFT_LOAD_MAX (default 2.0) before measuring and is stamped invalid_load if it must start loaded, a daemon thread additionally samples FOREIGN cpu (system busy jiffies minus this process, /proc/stat vs /proc/self/stat, every 5s) for the whole suite and a mean above SPARK_GRAFT_FOREIGN_MAX (default 2.0 cores) stamps midrun_load_breach and run_suspect - the start-only loadavg gate is blind to co-tenants arriving mid-run and raw loadavg cannot police the middle of a run that itself runs local[32], and any query still >=2x its reference after in-flight retries gets one end-of-suite requeue (min taken); BENCH_REF refresh rule: a new reference requires two back-to-back verified-idle runs agreeing within ~1%, a committed tools/bench_trend.py comparison vs the outgoing anchor, and a stated cause in the commit - serial refreshes without that evidence could hide a slow creep; scaling evidence (r16 verdict #2): cpus/default_parallelism record the session parallelism ($$SPARK_GRAFT_CPUS is honored - master local[cpus], shuffle.partitions=cpus) and jobs/tasks carry per-query driver-job and task counts from the min-time run (passive SparkListener; onJobStart/onStageSubmitted fire before the work they announce, so counts are complete when the synchronous force() returns) - at bench SF most queries are near the per-job scheduling floor, so a flat wall ratio between cpu counts is attributable to driver-job latency, not to ignored cores"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    // The driver captures only the last 2000 BYTES of stdout (BENCH_r03
    // "tail" is 2000 chars and starts mid-line, so the full per-query
    // map never parses). Print a COMPACT line — total + the slowest N
    // queries at 3 dp — guaranteed to fit the capture window; the
    // complete map lives in the file written above.
    def compactLine(n: Int): String = {
      val slowest = results.sortBy(-_._2).take(n)
        .map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      val susp = suspectList.take(n)
        .map { case (k, v, ref) => "\"" + k + s"""\":{"value":${r3(v)},"ref":$ref}""" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$slowest,"queries_run":${results.size},"cpus":$cpus,"default_parallelism":$defaultPar,"suspect":$susp,"clean_total":${r3(cleanTotal)},"cpu_1t":${r3(cpu1t)},"cpu_alloc":${r3(cpuAlloc)},"host_factor":${r3(hostFactor)},"run_drift":${r3(runDrift)},"run_drift_norm":${r3(runDriftNorm)},"run_suspect":$runSuspect,"invalid_load":$invalidLoad,"foreign_mean":${r3(foreignMean)},"foreign_peak":${r3(foreignPeak)},"midrun_load_breach":$midrunBreach,"load_start":$loadStart,"load_end":$loadEnd,"failed":${failed.size},"sf":"$sfDir","full_results":"$outPath"}"""
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
