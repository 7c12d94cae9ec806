package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FeatureEng

class FeatureEngSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def ev(rows: (Long, Long, Timestamp, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")

  test("z-score: mean 0 pattern, zero-variance group yields NULL") {
    val d = ev(
      (1L, 1L, t(0), "a", 10.0), (2L, 1L, t(1), "a", 20.0),
      (3L, 1L, t(2), "a", 30.0),
      (4L, 2L, t(0), "b", 7.0), (5L, 2L, t(1), "b", 7.0))
    val out = FeatureEng.zscoreNormalize(d).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(4L).isEmpty && out(5L).isEmpty) // sigma = 0
    assert(out(2L).contains(0.0))              // at the mean
    assert(out(1L).get < 0 && out(3L).get > 0)
    assert(math.abs(out(1L).get + out(3L).get) < 1e-12) // symmetric
  }

  test("ewma: dyadic weights accumulate exactly, resets per user") {
    val d = ev(
      (1L, 1L, t(0), "a", 8.0), (2L, 1L, t(1), "a", 4.0),
      (3L, 1L, t(2), "a", 2.0),
      (4L, 2L, t(0), "a", 100.0))
    val out = FeatureEng.ewmaAmounts(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) == 8.0)
    assert(out(2L) == 4.0 + 8.0 / 2)       // 8.0
    assert(out(3L) == 2.0 + 4.0 / 2 + 8.0 / 4) // 6.0
    assert(out(4L) == 100.0)               // other user unaffected
  }

  test("quantile bins partition each type into balanced ordered bins") {
    val d = ev((1L to 25L).map(i =>
      (i, i, t(i.toInt), "a", i.toDouble)): _*)
    val out = FeatureEng.quantileBins(d, bins = 5).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == (1 to 5).toSet)
    assert(out.values.forall(_._1 == 5L)) // 25 rows / 5 bins
    assert(out(1)._2 == 1.0 && out(5)._3 == 25.0)
    // bins are contiguous, non-overlapping ranges
    assert((1 to 4).forall(b => out(b)._3 < out(b + 1)._2))
  }

  test("stratified sample draws exactly floor(n/10) per stratum") {
    val d = ev((1L to 43L).map(i =>
      (i, i, t(i.toInt), if (i <= 30) "a" else "b", i.toDouble)): _*)
    val out = FeatureEng.stratifiedSample(d).collect()
      .map(r => r.getString(1))
    assert(out.count(_ == "a") == 3) // floor(30/10)
    assert(out.count(_ == "b") == 1) // floor(13/10)
    // deterministic: same draw on a re-run
    val again = FeatureEng.stratifiedSample(d).collect().map(_.getLong(0)).toSet
    assert(again == FeatureEng.stratifiedSample(d).collect()
      .map(_.getLong(0)).toSet)
  }

  test("feature selection: independent features score 0, dependent ~ln 2") {
    // independent: both types convert at the same 50% rate
    val ind = ev(
      (1L, 1L, t(0), "a", 200.0), (2L, 1L, t(1), "a", 1.0),
      (3L, 1L, t(2), "b", 200.0), (4L, 1L, t(3), "b", 1.0))
    val r0 = graft.operators.FeatureEng.featureSelection(ind).collect().head
    assert(r0.getDouble(0) == 0.0 && r0.getDouble(1) == 0.0)
    // fully dependent: type determines conversion → MI = ln 2
    val dep = ev(
      (1L, 1L, t(0), "a", 200.0), (2L, 1L, t(1), "a", 300.0),
      (3L, 1L, t(2), "b", 1.0), (4L, 1L, t(3), "b", 2.0))
    val r1 = graft.operators.FeatureEng.featureSelection(dep).collect().head
    assert(math.abs(r1.getDouble(0) - math.log(2.0)) < 1e-5)
    assert(math.abs(r1.getDouble(1) - 4.0) < 1e-5) // chi2 = N for perfect 2x2
  }

  test("pagerank: integer ranks are deterministic and mass-bounded") {
    val d = ev((1L to 40L).map(i =>
      (i, i % 5, t(i.toInt), "a", i.toDouble)): _*)
    val out = graft.operators.GraphRank.pagerankBipartite(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = graft.operators.GraphRank.pagerankBipartite(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == again) // exact integer ranks, run-to-run identical
    val S = graft.operators.GraphRank.Scale
    assert(out.values.forall(v => v >= S * 15 / 100 && v <= S * out.size))
    // total mass never exceeds the injected mass (floors only lose)
    assert(out.values.sum <= S * out.size)
  }

  test("chunk plan: boundary and overlap arithmetic") {
    val d = Seq(
      (1L, Seq.fill(128)("w").mkString(" ")),  // exactly one chunk
      (2L, Seq.fill(129)("w").mkString(" ")),  // one token over → 2 chunks
      (3L, Seq.fill(240)("w").mkString(" ")),  // 128 + 112 exactly
      (4L, "short doc"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.chunkPlan(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((1L, 128L)))
    assert(out(2L) == ((2L, 17L)))  // second chunk starts at 112: 129-112
    assert(out(3L) == ((2L, 128L))) // full second chunk
    assert(out(4L) == ((1L, 2L)))
  }

  test("skew profile surfaces the hot key with the right ratio") {
    // key 1: 8 rows; keys 2..5: 2 rows each → mean 3.2, skew 2.5
    val rows = (1 to 8).map(i => (i.toLong, 1L)) ++
      (2L to 5L).flatMap(k => Seq((100 + k, k), (200 + k, k)))
    val d = rows.toDF("event_id", "user_id")
    val out = graft.operators.Quality.keySkewProfile(d, "user_id", k = 2)
      .collect()
    assert(out.length == 2)
    val top = out.head
    assert(top.getAs[Long]("user_id") == 1L)
    assert(top.getAs[Long]("max_rows") == 8L)
    assert(top.getAs[Long]("n_keys") == 5L)
    assert(top.getAs[Double]("skew_ratio") == 8.0 / 3.2)
  }

  test("gap profile finds the longest dormant streak") {
    // user 1 active at hours 0,1,5,6 → empty hours 2,3,4 (run 3)
    val d = (Seq(0, 1, 5, 6).map(h => (h.toLong, 1L, t(h * 60), "a", 1.0)) ++
      Seq((10L, 2L, t(0), "a", 1.0))) // user 2: single hour, no gaps
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.operators.WindowedAggs.hourlyGapProfile(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((7L, 4L, 3L, 3L)))
    assert(out(2L) == ((1L, 1L, 0L, 0L)))
  }

  test("drift monitor: identical halves score ~0, shifted halves alarm") {
    import org.apache.spark.sql.functions.{col, lit}
    def ev2(vals: Seq[(Double, Boolean)]) = vals.zipWithIndex.map {
      case ((v, ref), i) => (i.toLong, 1L, t(if (ref) 0 else 1000), "a", v)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val pred = col("ts") < lit(t(500))
    // identical value distribution in both halves → zero drift
    val same = ev2(Seq(10.0, 50.0, 90.0, 130.0).flatMap(v =>
      Seq(v -> true, v -> false)))
    val r0 = graft.operators.Quality.driftMonitor(same, pred).collect().head
    assert(r0.getAs[Double]("psi") == 0.0 && r0.getAs[Double]("ks") == 0.0)
    // reference mass in bin 0, current mass in bin 9 → strong drift
    val shifted = ev2(
      Seq.fill(8)(5.0 -> true) ++ Seq.fill(8)(395.0 -> false))
    val r1 = graft.operators.Quality.driftMonitor(shifted, pred).collect().head
    assert(r1.getAs[Double]("psi") > 1.0)  // PSI > 0.2 is the action bar
    assert(r1.getAs[Double]("ks") == 1.0)  // disjoint CDFs
  }

  test("winsorize clamps outliers to the in-band extremes, flags them") {
    // 0..99 plus one huge outlier: p99 sits inside, 1000 gets clipped
    val d = ((0 until 100).map(i => (i.toLong, "a", i.toDouble)) :+
      (100L, "a", 1000.0))
      .toDF("event_id", "event_type", "value")
    val out = FeatureEng.winsorize(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(100L).getAs[Boolean]("clipped_high"))
    assert(out(100L).getAs[Double]("value_winsorized") < 1000.0)
    assert(out(50L).getAs[Double]("value_winsorized") == 50.0)
    assert(!out(50L).getAs[Boolean]("clipped_low") &&
           !out(50L).getAs[Boolean]("clipped_high"))
    val clippedLow = out.values.count(_.getAs[Boolean]("clipped_low"))
    assert(clippedLow >= 1) // p01 of 101 values clips the minimum
  }

  test("k-anonymity probe: every reported class is genuinely below k") {
    val events = graft.sources.Tables(spark, TestSpark.sf, "events")
    val risky = graft.operators.Quality.kAnonymityRisk(events, k = 5)
    assert(risky.filter($"n" >= 5).count() == 0)
    // cross-check one reported class against a direct count
    val r = risky.orderBy($"event_type", $"tod_band", $"amount_decade").head()
    val direct = graft.operators.Quality.kAnonymityRisk(events, k = Long.MaxValue)
      .filter($"event_type" === r.getString(0) &&
        $"tod_band" === r.getLong(1) && $"amount_decade" === r.getLong(2))
      .head().getLong(3)
    assert(direct == r.getLong(3))
  }

  test("negative samples exclude positives and are deterministic") {
    val d = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 2L, "a"))
      .toDF("event_id", "user_id", "event_type")
    def run() = FeatureEng.negativeSamples(d, "user_id", "event_type",
        k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val out = run()
    // user 1 saw the whole vocabulary → no negatives; user 2 lacks b
    assert(out.toSeq == Seq((2L, "b", 1)))
    assert(run().toSeq == out.toSeq)
  }

  test("negative sampling is a bounded per-user draw mirroring the " +
       "hash arithmetic") {
    // the scale contract: candidate GENERATION is O(users·draws) —
    // each user yields at most `draws` candidates no matter how large
    // the catalog, and every candidate reproduces the reference md5
    // arithmetic (first four nibbles of md5("negd:user:i") mod |vocab|
    // into the dense sorted catalog index)
    val d = (1L to 40L).flatMap(u => (1L to 10L)
        .filter(i => (u + i) % 3 == 0).map(i => (u, i)))
      .toDF("user_id", "item_id")
    val out = graft.operators.FeatureEng
      .negativeSamples(d, "user_id", "item_id", k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val vocab = (1L to 10L).toVector // dense sorted catalog: vi = item
    val expected = (1L to 40L).flatMap { u =>
      val pos = (1L to 10L).filter(i => (u + i) % 3 == 0).toSet
      (1 to 16).map { i =>
        val draw16 = Integer.parseInt(md5hex(s"negd:$u:$i").take(4), 16)
        vocab(draw16 % vocab.size)
      }.distinct.filterNot(pos).map(it => (u, it))
    }.toSet
    assert(out == expected)
    out.groupBy(_._1).values.foreach(xs => assert(xs.size <= 16))
  }

  test("rebalance: minority class keeps everything, majority shrinks to ~min") {
    val d = (1L to 1000L).map(i => (i, if (i <= 900) "big" else "small"))
      .toDF("event_id", "event_type")
    val prof = graft.operators.FeatureEng.rebalanceProfile(d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // minority threshold is minc*65536/minc = the full draw space
    assert(prof("small") == ((100L, 100L, 1.0)))
    val (nb, nk, _) = prof("big")
    assert(nb == 900L)
    // expected keep 100 of 900; the 16-bit hash draw concentrates
    // tightly (binomial sd ~9.4) — accept ±5 sd
    assert(math.abs(nk - 100L) <= 47, s"kept $nk of 900, expected ~100")
    // exact mirror of the draw: the kept set is the md5 predicate
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectBig = (1L to 900L).count(i =>
      Integer.parseInt(md5hex(s"bal:$i").take(4), 16) * 900L < 100L * 65536L)
    assert(nk == expectBig)
  }

  test("kfold: user-keyed folds — no user straddles folds") {
    val d = (1L to 300L).map(i => (i % 40, i, 1.0 * i))
      .toDF("user_id", "event_id", "value")
    val prof = graft.operators.FeatureEng.kfoldProfile(d).collect()
    // group-aware: per-fold user counts partition the user set exactly
    assert(prof.map(_.getLong(2)).sum == 40L)
    assert(prof.map(_.getLong(1)).sum == 300L)
    // direct check: each user's rows carry one fold
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fold0 = Integer.parseInt(md5hex("fold:0").take(4), 16) % 5
    assert(prof.exists(r => r.getLong(0) == fold0))
  }

  test("histogram: floor-before-cast bin boundaries are exact") {
    val d = Seq(("a", 0.0), ("a", 49.999), ("a", 50.0), ("a", 99.9),
      ("a", 100.0)).toDF("event_type", "value")
    val out = graft.operators.FeatureEng.valueHistogram(d).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }

  test("correlation: perfect positive linear feature pair gives r = 1") {
    // value = 10 * hour  →  r must be exactly 1 within the exact-agg
    // quantization (scaled sums are exact, so r lands within 1e-9)
    val d = (0 until 24).map { h =>
      (h.toLong, 1L, Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"),
        "a", h * 10.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = FeatureEng.featureCorrelation(d).collect().head.getDouble(2)
    assert(math.abs(r - 1.0) < 1e-9)
  }

  test("quality classifier margin matches a hand-computed reference") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(c: Char) = Integer.parseInt(c.toString, 16)
    val words = Seq("alpha", "beta", "alpha", "gamma", "delta")
    // replicate the derivation token-by-token: bucket + sign from the
    // token md5, weight from md5("qw:" + bucket), margin in exact ints
    val expected = words.map { t =>
      val h = md5hex(t)
      val bucket = (nib(h(0)) * 16 + nib(h(1))) % 64
      val sign = if (h(2) >= '8') 1L else -1L
      (bucket, sign)
    }.groupBy(_._1).map { case (b, xs) =>
      val wh = md5hex(s"qw:$b")
      val w = (nib(wh(0)) * 16 + nib(wh(1))) % 101 - 50
      xs.map(_._2).sum * w
    }.sum
    val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = FeatureEng.qualityClassifier(d).collect()
    assert(out.length == 1 && out(0).getLong(1) == expected)
    assert(out(0).getBoolean(2) == (expected >= 0L))
    // the row-local fold equals the hashedFeatures per-bucket grouping
    // (order-free integer sum) — the equivalence the zero-shuffle
    // spelling rests on
    import org.apache.spark.sql.functions._
    val viaBuckets = FeatureEng.hashedFeatures(d)
      .select(col("doc_id"), col("bucket"), col("weight"))
      .collect().map { r =>
      val b = r.getInt(1)
      val wh = md5hex(s"qw:$b")
      val w = (nib(wh(0)) * 16 + nib(wh(1))) % 101 - 50
      r.getLong(2) * w
    }.sum
    assert(viaBuckets == expected)
  }
}
