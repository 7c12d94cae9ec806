package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis}

class DocOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val g = Dedup.exactGroups(d).collect()
    assert(g.length == 2)
    assert(g.find(_.getLong(1) == 2).get.getLong(2) == 1L) // keep min id
  }

  test("jaccard pairs finds near-dup, skips unrelated") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val pairs = Dedup.jaccardPairs(
      docs((1L, base), (2L, nearDup), (3L, other)), threshold = 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("minhash candidates include exact duplicates") {
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val c = Dedup.minhashCandidates(docs((1L, t), (2L, t))).collect()
    assert(c.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("simhash of identical docs is identical; hamming 0 pair found") {
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val sigs = Dedup.simhash(docs((1L, t), (2L, t))).collect()
    assert(sigs.map(_.getLong(1)).distinct.length == 1)
    val pairs = Dedup.simhashPairs(docs((1L, t), (2L, t)), 3).collect()
    assert(pairs.exists(r => r.getInt(2) == 0))
  }

  test("brute-force topk ranks an identical vector first") {
    val v = Array.tabulate(64)(i => i.toFloat / 64)
    val w = Array.tabulate(64)(i => (63 - i).toFloat / 64)
    val df = Seq((0L, v), (1L, v), (2L, w)).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, col("vec_id") === 0, 2).collect()
    val first = top.find(_.getInt(3) == 1).get
    assert(first.getLong(1) == 1L)
    assert(math.abs(first.getDouble(2) - 1.0) < 1e-12)
  }

  test("IVF ANN recovers most brute-force neighbors at nprobe/nlist=1/4") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, col("vec_id") < 8, 3))
    val ivf = pairs(Similarity.ivfTopK(emb, col("vec_id") < 8, 3))
    assert(ivf.size == bf.size)  // k results per query either way
    // probing 4 of 16 lists: measured 23/24 overlap at sf0.01
    assert((ivf & bf).size >= (0.6 * bf.size).toInt,
      s"recall ${(ivf & bf).size}/${bf.size}")
  }

  test("ann recall eval matches an independent intersection of the two operators") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val pred = col("vec_id") < 8
    for (method <- Seq("ivf", "lsh")) {
      val out = Similarity.annRecall(emb, pred, k = 3, method = method)
        .collect()
      assert(out.length == 8, s"$method: one row per query")
      out.foreach { r =>
        assert(r.getLong(2) == 3L)
        assert(r.getLong(1) >= 0L && r.getLong(1) <= 3L)
        assert(r.getDouble(3) == r.getLong(1).toDouble / 3.0)
      }
      // independent recomputation from the two public operators
      val truth = Similarity.bruteForceTopK(emb, pred, 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val approxDf = if (method == "ivf") Similarity.ivfTopK(emb, pred, 3)
                     else Similarity.lshTopK(emb, pred, 3)
      val approx = approxDf.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
      truth.groupBy(_._1).foreach { case (q, ts) =>
        assert(hits(q) == ts.count(approx.contains).toLong,
          s"$method query $q")
      }
      graft.operators.OperatorCaches.releaseAll()
    }
  }

  test("repeated-substring profile: strided form measured against the " +
    "exact stride-1 sweep (precision structural, threshold use exact, " +
    "any-repeat flag honestly weak)") {
    val d = graft.sources.Tables(spark, sf, "documents")
    def prof(stride: Int): Map[Long, (Long, Long)] = {
      val m = Dedup.repeatedSubstrings(d, k = 20, stride = stride)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      graft.operators.OperatorCaches.releaseAll()
      m
    }
    val exact = prof(1)    // stride=1 IS the exact full n-gram sweep
    val strided = prof(10) // the shipped default
    def frac(m: Map[Long, (Long, Long)], id: Long): Double = {
      val (nw, nr) = m(id); if (nw > 0) nr.toDouble / nw else 0.0
    }
    val ids = exact.keys.toSeq
    // structural precision: strided windows are a subset of the exact
    // window set, so every strided repeat is an exact repeat
    ids.foreach { id =>
      assert(strided(id)._2 <= exact(id)._2, s"doc $id")
      if (strided(id)._2 > 0) assert(exact(id)._2 > 0, s"doc $id")
    }
    // the documented USE — thresholding the duplication score at 0.5 —
    // agrees with the exact sweep perfectly on this corpus
    val de = ids.filter(frac(exact, _) >= 0.5).toSet
    val ds = ids.filter(frac(strided, _) >= 0.5).toSet
    assert(de == ds, s"threshold sets differ: ${(de diff ds).take(3)} / " +
      s"${(ds diff de).take(3)}")
    // score fidelity: MAE of repeated_frac over exact-flagged docs
    val flagged = ids.filter(exact(_)._2 > 0)
    val mae = flagged.map(id =>
      math.abs(frac(exact, id) - frac(strided, id))).sum / flagged.size
    assert(mae < 0.08, s"repeated_frac MAE $mae")
    // HONESTY pin: the strided form is a score estimator, NOT an
    // any-repeat detector — misaligned cross-doc spans fall between
    // sampled starts, so the flag-level recall is LOW (measured 0.32
    // at sf0.001, 0.28 at sf0.01). If this ever reads high the corpus
    // changed and the scaladoc numbers need re-measuring.
    val flagRecall = flagged.count(strided(_)._2 > 0).toDouble / flagged.size
    assert(flagRecall > 0.1 && flagRecall < 0.6,
      s"any-repeat flag recall $flagRecall outside the documented band " +
        "— re-measure the scaladoc/COVERAGE numbers")
  }

  test("repeatedSubstrings rejects nondeterministic inputs (the " +
    "uncached two-pass trade needs a fixed snapshot)") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"))
      .toDF("doc_id", "text")
    // deterministic frame: fine
    graft.operators.Dedup.repeatedSubstrings(docs, k = 10).collect()
    // a rand() filter would give the freq pass and the join pass
    // different snapshots — must be rejected at plan time
    assertThrows[IllegalArgumentException](
      graft.operators.Dedup.repeatedSubstrings(
        docs.filter(rand(7) < lit(2.0)), k = 10))
    // fixing a snapshot makes the same shape legal again
    val pinned = docs.filter(rand(7) < lit(2.0)).localCheckpoint(true)
    graft.operators.Dedup.repeatedSubstrings(pinned, k = 10).collect()
  }

  test("ann recall ladder: one row per variant, cross-checked vs annRecall, " +
    "rerank rungs dominate their raw-ADC rungs") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val pred = col("vec_id") < 8
    val out = Similarity.annRecallLadder(emb, pred, k = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out.keySet == Set("ivf", "lsh", "ivfpq", "ivfpq_rerank",
      "ivfpq_residual", "residual_rerank", "rp_rerank", "trained_rerank"))
    out.foreach { case (m, (hits, truth, recall)) =>
      assert(truth == 24L, s"$m: 8 queries x k=3 truth rows")
      assert(hits >= 0L && hits <= truth, m)
      assert(recall == hits.toDouble / truth.toDouble, m)
    }
    // the two gate rungs must micro-average the per-query annRecall rows
    for (method <- Seq("ivf", "lsh")) {
      val per = Similarity.annRecall(emb, pred, k = 3, method = method)
        .collect().map(_.getLong(1)).sum
      assert(out(method)._1 == per, s"$method ladder vs annRecall")
    }
    // exact rerank over a superset shortlist can only displace a truth
    // member with another truth member (higher exact cosine over the
    // full corpus implies true-top-k membership), so the rerank rung's
    // recall dominates its raw-ADC rung
    assert(out("ivfpq_rerank")._3 >= out("ivfpq")._3)
    assert(out("residual_rerank")._3 >= out("ivfpq_residual")._3)
    graft.operators.OperatorCaches.releaseAll()
  }

  test("clustered-regime recall panel: deterministic corpus shape, " +
    "methods subset honored, serving stack recovers full recall") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val clustered = Similarity.clusteredCopies(emb)
    // 16 centers + 16 x 40 copies, ids center + 16c — fixed by design
    assert(clustered.count() == 16L * 41)
    val ids = clustered.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == (0 until 16 * 41).map(_.toLong).toSet)
    // a copy sits within noise distance of its center: max |eps| is
    // 8.5/128 per coordinate
    val pair = clustered.filter(col("vec_id") === 0 || col("vec_id") === 320)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    val diff = pair(0L).zip(pair(320L)).map { case (a, b) => math.abs(a - b) }
    assert(diff.max <= 8.5 / 128 + 1e-12, diff.max)
    val out = Similarity.annRecallLadder(clustered,
        col("vec_id") >= 320 && col("vec_id") < 328, k = 3,
        methods = Seq("ivfpq", "ivfpq_residual", "residual_rerank"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set("ivfpq", "ivfpq_residual", "residual_rerank"))
    // the serving stack (coarse probe -> residual ADC -> exact rerank)
    // must recover full recall on the regime it is sold for — the
    // clustered corpus concentrates truth inside the probed cells
    assert(out("residual_rerank") == 1.0, out)
    assert(out("residual_rerank") >= out("ivfpq_residual"))
    assertThrows[IllegalArgumentException](
      Similarity.annRecallLadder(clustered, col("vec_id") < 8,
        methods = Seq("nope")))
    graft.operators.OperatorCaches.releaseAll()
  }

  test("ann recall curve is monotone in nprobe and exact at full probe") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val out = Similarity.annRecallCurve(emb, col("vec_id") < 8, k = 3,
        nprobes = Seq(1, 4, 16)).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    graft.operators.OperatorCaches.releaseAll()
    // candidate sets are nested in nprobe, and any candidate that
    // displaces a true top-k hit must itself be a true top-k member
    // (same cosine ordering) — so recall can never decrease
    assert(out(1) <= out(4) && out(4) <= out(16),
      s"recall curve not monotone: $out")
    // probing every list IS brute force (nlist = 16 default)
    assert(out(16) == 1.0)
  }

  test("IVF-PQ ADC: probing all lists equals an independent full-ADC ranking") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    // independent spelling of full ADC: reconstruct each vector from
    // its PQ codes (sub-centroid lookup) is NOT equivalent — ADC keeps
    // the query side exact. So the yardstick recomputes approx
    // distances pairwise from raw vectors quantizing ONLY the
    // candidate: for each (q, x), adist = Σ_m ||q_m − c_{code_m(x)}||².
    // Build it with collect()-side arithmetic over the tiny sf0.001
    // corpus — an all-Scala oracle that shares no Spark plan with the
    // operator under test.
    val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ksub = 16; val msub = 8; val dsub = 8
    val book = (0 until ksub).map(c => vecs(c.toLong))
    def sd(a: Array[Double], b: Array[Double], mi: Int): Double =
      (0 until dsub).map(j => { val d = a(mi * dsub + j) - b(mi * dsub + j); d * d }).sum
    def codeOf(x: Array[Double], mi: Int): Int =
      (0 until ksub).minBy(c => (sd(x, book(c), mi), c))
    def adist(q: Array[Double], x: Array[Double]): Double =
      (0 until msub).map(mi => sd(q, book(codeOf(x, mi)), mi)).sum
    val expected = (0L until 8L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(x => (x, adist(vecs(q), vecs(x))))
        .sortBy { case (x, d) => (d, x) }.take(3).zipWithIndex
        .map { case ((x, _), i) => (q, x, i + 1) }
    }.toSet
    val got = Similarity.ivfPqTopK(emb, col("vec_id") < 8, k = 3,
        nlist = 16, nprobe = 16)
      .select("query_id", "neighbor_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, "full-probe IVF-PQ must equal brute-force ADC")
  }

  test("IVF-PQ at nprobe=4 keeps useful recall vs exact brute force") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, col("vec_id") < 8, 3))
    val pq = pairs(Similarity.ivfPqTopK(emb, col("vec_id") < 8, 3))
    assert(pq.size == bf.size)
    // double approximation (coarse probe + 8-byte codes) UNDER the
    // deterministic untrained codebook the oracle requires: measured
    // 5/24 at sf0.001 vs ~0/24 for random picks from a 600-vector
    // corpus. A trained per-subspace k-means book raises this — the
    // plan shape is what's under test; ADC fidelity itself is pinned
    // exactly by the full-probe parity test above.
    assert((pq & bf).size >= 3, s"recall ${(pq & bf).size}/${bf.size}")
  }

  test("rerank-everything collapses both two-stage stacks to exact IVF") {
    // with rerank >= every probed candidate, the exact-cosine refine
    // re-ranks the FULL probed set — so the two-stage operators must
    // equal ivfTopK bit-for-bit regardless of what the ADC pass did
    // (raw or residual codes): the quantization can only reorder the
    // shortlist CUT, and there is no cut. Ties this session's
    // residual stack (and the raw one) to the exact twin by algebra,
    // not by sampled recall.
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val all = emb.count().toInt
    val exact = key(Similarity.ivfTopK(emb, col("vec_id") < 8, k = 5))
    assert(key(Similarity.ivfPqRerankTopK(emb, col("vec_id") < 8, k = 5,
      rerank = all)) == exact)
    assert(key(Similarity.ivfPqResidualRerankTopK(emb, col("vec_id") < 8,
      k = 5, rerank = all)) == exact)
    graft.operators.OperatorCaches.releaseAll()
  }

  test("MMR skips the near-duplicate that pure relevance ranks second") {
    import spark.implicits._
    // ids 1 and 2 are near-clones of the query; 3 is moderately
    // relevant but different. Relevance alone ranks (2, 1, 3); MMR at
    // a diversity-leaning lambda keeps the top pick and then jumps to
    // 3 instead of the near-duplicate 1.
    val emb = Seq(
      (1L, Seq(1.0, 0.19, 0.0, 0.0)),
      (2L, Seq(1.0, 0.21, 0.0, 0.0)),
      (3L, Seq(0.6, 0.8, 0.0, 0.0)),
      (100L, Seq(1.0, 0.2, 0.0, 0.0))).toDF("vec_id", "embedding")
    val relOrder = Similarity.ivfTopK(emb, col("vec_id") === 100L, k = 2,
        nlist = 16, nprobe = 4, dim = 4)
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(relOrder == Seq(2L, 1L), s"relevance order was $relOrder")
    graft.operators.OperatorCaches.releaseAll()
    val picks = Similarity.mmrTopK(emb, col("vec_id") === 100L, k = 2,
        pool = 3, lam = 0.3, nlist = 16, nprobe = 4, dim = 4)
      .orderBy("pick").collect().map(_.getLong(1)).toSeq
    assert(picks == Seq(2L, 3L), s"expected diversity pick, got $picks")
    graft.operators.OperatorCaches.releaseAll()
  }

  test("bestOfCluster canonicals are the max-quality members") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val rows = Dedup.bestOfCluster(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.exists(_._2.length > 1), "need a multi-doc cluster")
    for ((_, members) <- byCluster) {
      val canon = members.head._3
      assert(members.forall(_._3 == canon), "one canonical per cluster")
      val best = members.minBy(m => (-m._4, m._1))
      assert(canon == best._1,
        s"canonical $canon is not the quality-best member ${best._1}")
    }
    graft.operators.OperatorCaches.releaseAll()
  }

  test("hard negatives exclude the same-label nearest neighbor") {
    import spark.implicits._
    // id 1 is the NEAREST shortlist member but shares the query's
    // label (a positive) — mining must skip it and return the
    // different-label 2 then 3, ranked by cosine.
    val emb = Seq(
      (1L, Seq(1.0, 0.2, 0.0, 0.0), 0),
      (2L, Seq(1.0, 0.3, 0.0, 0.0), 1),
      (3L, Seq(0.6, 0.8, 0.0, 0.0), 1),
      (100L, Seq(1.0, 0.2, 0.0, 0.0), 0)).toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(emb, col("vec_id") === 100L,
        k = 2, pool = 3, nlist = 16, nprobe = 4, dim = 4)
      .orderBy("neg_rank").collect()
    assert(negs.map(_.getLong(1)).toSeq == Seq(2L, 3L),
      s"expected (2, 3), got ${negs.mkString(", ")}")
    assert(negs.forall(_.getInt(2) == 1))
    graft.operators.OperatorCaches.releaseAll()
  }

  test("k-means assignment equals an exact in-Scala Lloyd mirror (quantized means)") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val k = 8; val dim = 64
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }; s
    }
    def score(v: Array[Double], c: Array[Double]): Double =
      -2.0 * dot(v, c) + dot(c, c)
    def assign(book: IndexedSeq[Array[Double]]): Map[Long, Int] =
      vecs.map { case (id, v) =>
        id -> (0 until k).minBy(j => (score(v, book(j)), j))
      }.toMap
    val seed = (0 until k).map(j => vecs(j)._2)
    val a1 = assign(seed)
    // ExactAgg mirror: per-coordinate scaled-BIGINT sum / 1e4 / n
    val trained = (0 until k).map { j =>
      val members = vecs.filter { case (id, _) => a1(id) == j }
      if (members.isEmpty) seed(j)
      else (0 until dim).map { p =>
        // HALF_UP (away from zero) — math.round would send −x.5 wrong
        def r(x: Double): Long =
          if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
        val tot = members.map { case (_, v) => r(v(p) * 1e4) }.sum
        tot.toDouble / 1e4 / members.size
      }.toArray
    }
    val expected = assign(trained).map { case (id, j) => id -> j.toLong }
    val got = Similarity.kmeansAssign(emb, k = k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    graft.operators.OperatorCaches.releaseAll()
  }

  test("trained k-means book cuts quantization distortion; trained IVF still searches") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    // distortion = mean min-L2² to the book — the objective Lloyd
    // provably (modulo the 1e-4 mean quantization) does not increase
    val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .collect().map(r => r.getSeq[Double](1).toArray)
    def l2(a: Array[Double], b: Array[Double]): Double =
      (0 until 64).map { i => val d = a(i) - b(i); d * d }.sum
    def distortion(book: Seq[Array[Double]]): Double =
      vecs.map(v => book.map(c => l2(v, c)).min).sum / vecs.length
    val seedBook = vecs.take(16).toSeq
    val trainedBook = Similarity.kmeansCarr(emb, k = 16, iters = 2)
      .select(col("carr")).head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getSeq[Double](1).toArray)
    val (d0, d1) = (distortion(seedBook), distortion(trainedBook))
    info(f"distortion: first-n book $d0%.4f, 2-round Lloyd $d1%.4f")
    assert(d1 < d0, s"Lloyd rounds must cut mean distortion: $d1 >= $d0")

    // trained pivots drop into the same search plan; recall vs brute
    // force stays in the useful band (NOT asserted better: on this
    // tiny fixture lower distortion ≠ higher fixed-nprobe recall —
    // measured 21/24 trained vs 23/24 first-n at sf0.001)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, col("vec_id") < 8, 3))
    val trainedPv = Similarity.kmeansPivotArr(emb, k = 16, iters = 2)
      .localCheckpoint(true)
    val trained = pairs(Similarity.ivfTopK(emb, col("vec_id") < 8, 3,
      pivotsOpt = Some(trainedPv)))
    assert(trained.size == bf.size)
    assert((trained & bf).size >= (0.6 * bf.size).toInt,
      s"trained-book recall ${(trained & bf).size}/${bf.size}")
    graft.operators.OperatorCaches.releaseAll()
  }

  test("banded near-dup: only true pairs, >=88% recall vs exact baseline") {
    // recall STRESS configuration (4-bit × 16 bands): near-full recall
    // at t=0.4 but Θ(N²) candidates — never the benchmarked default
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.nearDupPairsExact(emb, 0.4))
    val banded = pairs(Similarity.nearDupPairs(emb, 0.4,
      bitsPerBand = 4, bands = 16))
    assert(banded.subsetOf(exact), "banded emitted a below-threshold pair")
    // measured 62/66 at sf0.001 with 4-bit × 16 bands
    assert(banded.size >= math.ceil(0.88 * exact.size).toInt,
      s"recall ${banded.size}/${exact.size}")
  }

  test("default near-dup banding (8x8) is selective: <=6% of pairs as candidates") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    // count candidates the same way nearDupPairs generates them:
    // verified output with threshold -1 keeps every candidate exactly once
    val cand = Similarity.nearDupPairs(emb, threshold = -1.0,
      bitsPerBand = 8, bands = 8).count()
    // background band-match probability is bands/2^bits = 8/256 ≈ 3.1%
    assert(cand <= (0.06 * allPairs).toLong,
      s"candidate ratio ${cand.toDouble / allPairs} exceeds selective bound")
    // still finds true near-dups (subset correctness is covered above)
    assert(Similarity.nearDupPairs(emb, 0.4,
      bitsPerBand = 8, bands = 8).count() > 0)
  }

  test("benchmarked near-dup regime (8x8, t=0.9, perturbed corpus) " +
       "is selective AND >=95%-recall") {
    // the q_emb_neardup configuration: corpus ∪ deterministic
    // perturbed copies, selective 8-bit × 8-band LSH, threshold 0.9 —
    // the regime where selectivity (~3% of pairs as candidates) and
    // recall coexist, unlike t=0.4 (recall ~27% with this banding,
    // pinned by the stress test above)
    val emb = Similarity.perturbedCopies(
      graft.sources.Tables(spark, sf, "embeddings"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.nearDupPairsExact(emb, 0.9))
    val banded = pairs(Similarity.nearDupPairs(emb, 0.9,
      bitsPerBand = 8, bands = 8))
    assert(exact.size >= 400,
      s"perturbed corpus should plant ~500 true pairs, got ${exact.size}")
    assert(banded.subsetOf(exact), "banded emitted a below-threshold pair")
    // measured 496/496 at sf0.001 (sign-flip prob ≈5%/coord → band
    // survives with p≈0.68 → ≥1-of-8 bands ≈ 99.99%)
    assert(banded.size >= math.ceil(0.95 * exact.size).toInt,
      s"recall ${banded.size}/${exact.size}")
    val n = emb.count()
    val cand = Similarity.nearDupPairs(emb, threshold = -1.0,
      bitsPerBand = 8, bands = 8).count()
    assert(cand <= (0.06 * (n * (n - 1) / 2)).toLong,
      s"candidate ratio ${cand.toDouble / (n * (n - 1) / 2)}")
  }

  test("connected components label transitive chains with the min id") {
    // chain 1-5, 5-9 plus clique {2,7}; singleton 3 keeps itself
    val pairs = Seq((1L, 5L), (5L, 9L), (2L, 7L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val out = Dedup.connectedComponents(pairs, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 5L -> 1L, 9L -> 1L,
                      2L -> 2L, 7L -> 2L, 3L -> 3L))
  }

  test("connected components: long path converges via pointer jumping") {
    val n = 40
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val nodes = (1L to n).toDF("doc_id")
    val out = Dedup.connectedComponents(pairs, nodes).collect()
    assert(out.length == n && out.forall(_.getLong(1) == 1L))
  }

  test("hashed features: bounded buckets, duplicated doc doubles weights") {
    val d = docs((1L, "alpha beta gamma alpha"), (2L, "alpha beta gamma alpha"))
    val out = graft.operators.FeatureEng.hashedFeatures(d).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
    val m = out.toMap
    assert(out.length == m.size)
    assert(out.forall { case ((_, b), _) => b >= 0 && b < 64 })
    // identical text ⇒ identical (bucket, weight) profile per doc
    val p1 = m.collect { case ((1L, b), w) => b -> w }
    val p2 = m.collect { case ((2L, b), w) => b -> w }
    assert(p1 == p2 && p1.nonEmpty)
  }

  test("incremental dedup classifies batch docs vs the corpus") {
    // corpus = odd ids; batch = even ids (pred: doc_id % 2 == 0)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (1L, base),                      // corpus
      (3L, "completely different words here about spark engines"),
      (2L, base),                      // batch: exact dup of 1
      (4L, base + " extra"),           // batch: near dup of 1 (shares bands)
      (6L, "unique unseen payload tokens nothing shared with corpus docs"))
    val out = graft.operators.Dedup
      .incrementalDedup(d, org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(2L, 4L, 6L))
    assert(out(2L) == "dup_exact")
    assert(out(4L) == "dup_near")
    assert(out(6L) == "new")
  }

  test("repetition metrics flag degenerate docs, pass diverse ones") {
    val d = docs(
      (1L, "spam spam spam spam spam"),             // one token repeated
      (2L, "alpha beta gamma delta epsilon zeta"),  // all distinct
      (3L, "solo"))                                 // single token: no bigrams
    val out = graft.operators.TextAnalysis.repetitionMetrics(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("is_repetitive"))
    assert(out(1L).getAs[Double]("top_token_share") == 1.0)
    assert(out(1L).getAs[Double]("top_bigram_share") == 1.0)
    assert(!out(2L).getAs[Boolean]("is_repetitive"))
    assert(out(2L).getAs[Double]("distinct_ratio") == 1.0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("top_bigram_share")))
    assert(out(3L).getAs[Long]("n_tokens") == 1L)
  }

  test("int8 quantization: exact dyadic values reconstruct losslessly") {
    // ±s and 0 always land on exact codes; 63.5/127·127 = 63.5 rounds
    // HALF_UP to code 64 → error 0.5, mse = 0.25/4
    val emb = Seq(
      (1L, Array(127.0f, -127.0f, 0.0f, 0.0f)),
      (2L, Array(127.0f, -127.0f, 0.0f, 63.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: guarded path
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(emb, dim = 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("scale") == 127.0)
    assert(out(1L).getAs[Double]("mse") == 0.0)
    assert(out(1L).getAs[Double]("max_abs_err") == 0.0)
    assert(math.abs(out(2L).getAs[Double]("mse") - 0.0625) < 1e-9)
    assert(math.abs(out(2L).getAs[Double]("max_abs_err") - 0.5) < 1e-9)
    assert(out(3L).getAs[Double]("scale") == 0.0)
    assert(out(3L).getAs[Double]("mse") == 0.0) // no NaN from 0/0
  }

  test("int8 quantization error is bounded by half a quantization step") {
    val emb = Seq((1L, Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)))
      .toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(emb).collect().head
    val s = r.getAs[Double]("scale")
    assert(r.getAs[Double]("max_abs_err") <= s / 127.0 / 2 + 1e-12)
    assert(r.getAs[Double]("mse") > 0.0)
  }

  test("unigram surprisal ranks rare-token docs above boilerplate") {
    val d = docs(
      (1L, "common common common common"),
      (2L, "common common rare unique"),
      (3L, "common common common common"))
    val out = graft.operators.TextAnalysis.unigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_surprisal")).toMap
    assert(out(2L) > out(1L))
    assert(out(1L) == out(3L)) // identical docs, identical score
    // all-common doc: surprisal = ln(12/10) rounded 6dp exactly
    assert(math.abs(out(1L) -
      math.rint(math.log(12.0 / 10) * 1e6) / 1e6) < 1e-9)
  }

  test("sequence packing: window spans follow the running token sum") {
    val d = docs(
      (1L, "a b c d"),                  // 4 tokens, cum 4
      (2L, "e f g h i j k l"),          // 8 tokens, cum 12 — straddles
      (3L, "m n o"))                    // 3 tokens, cum 15
    val out = TextAnalysis.packSequences(d, budget = 10).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((4L, 0L, 0L, 1L)))
    assert(out(2L) == ((8L, 0L, 1L, 2L))) // spans the window boundary
    assert(out(3L) == ((3L, 1L, 1L, 1L)))
  }

  test("eval contamination lists exactly the cross-split winnow partners") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val out = TextAnalysis.evalContamination(d).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    graft.operators.OperatorCaches.releaseAll()
    // independent recomputation: winnowOverlap + the salted split rule
    val pairs = TextAnalysis.winnowOverlap(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.operators.OperatorCaches.releaseAll()
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h2 = md.digest(s"split:$id".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (h2 < "cc") "train" else if (h2 < "e6") "val" else "test"
    }
    val expect =
      scala.collection.mutable.Map[(Long, String), (Long, Long)]()
    def add(id: Long, s: String, n: Long): Unit = {
      val (c, t) = expect.getOrElse((id, s), (0L, 0L))
      expect((id, s)) = (c + 1, t + n)
    }
    pairs.foreach { case (a, b, n) =>
      val (sa, sb) = (splitOf(a), splitOf(b))
      if (sa != "train" && sb == "train") add(a, sa, n)
      if (sb != "train" && sa == "train") add(b, sb, n)
    }
    assert(out == expect.toMap)
    assert(out.nonEmpty, "corpus should have cross-split overlaps")
    assert(out.keys.forall(_._2 != "train"))
  }

  test("dsir selection honors per-source floors then fills by weight") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val out = TextAnalysis.dsirSelect(d, col("lang") === "en",
      budget = 60L, floorPerSource = 5L).collect()
    graft.operators.OperatorCaches.releaseAll()
    val perSource = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source gets exactly min(floor, its size) floor picks
    perSource.foreach { case (s, n) =>
      val fp = out.count(r =>
        r.getString(1) == s && r.getString(3) == "floor")
      assert(fp.toLong == math.min(5L, n), s"source $s")
    }
    val nFloor = out.count(_.getString(3) == "floor").toLong
    val nFill = out.count(_.getString(3) == "fill").toLong
    assert(nFill ==
      math.max(0L, math.min(60L - nFloor, d.count() - nFloor)))
    // the fill is the best-scoring remainder: every unselected doc is
    // strictly worse than the worst fill pick by (weight desc, id)
    val w = TextAnalysis.dsirWeights(d, col("lang") === "en").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.operators.OperatorCaches.releaseAll()
    val chosen = out.map(_.getLong(0)).toSet
    val ord = implicitly[Ordering[(Double, Long)]]
    if (nFill > 0) {
      val worstFill = out.filter(_.getString(3) == "fill")
        .map(r => (-r.getDouble(2), r.getLong(0))).max(ord)
      w.keys.filterNot(chosen).foreach { id =>
        assert(ord.gt((-w(id), id), worstFill), s"doc $id outranks a fill")
      }
    }
  }

  test("sharded packSequences: per-shard output equals the global form run on that shard alone") {
    // shard-disjoint corpus: each shard is an independent token
    // stream, so the sharded spelling restricted to a shard must be
    // row-identical to packing that shard's documents globally
    val d = docs(
      (1L, "a b c d"), (2L, "e f g h i j k l"), (3L, "m n o"),
      (10L, "p q"), (11L, "r s t u v w x y z aa bb"), (12L, "cc"))
      .withColumn("shard", when(col("doc_id") < 10L, "s0").otherwise("s1"))
    val sharded = TextAnalysis
      .packSequences(d, budget = 10, shardCol = Some("shard"))
    for (s <- Seq("s0", "s1")) {
      val got = sharded.filter(col("shard") === s).drop("shard")
        .collect().map(_.toSeq).toSet
      val want = TextAnalysis
        .packSequences(d.filter(col("shard") === s), budget = 10)
        .collect().map(_.toSeq).toSet
      assert(got == want, s"shard $s diverged from the global form")
    }
    // degenerate single-shard corpus: sharded == global exactly
    val one = TextAnalysis.packSequences(
        d.withColumn("shard", lit("all")), budget = 10,
        shardCol = Some("shard"))
      .drop("shard").collect().map(_.toSeq).toSet
    val glob = TextAnalysis.packSequences(d, budget = 10)
      .collect().map(_.toSeq).toSet
    assert(one == glob)
  }

  test("dataset split partitions the whole corpus, train majority") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val out = TextAnalysis.datasetSplit(docs).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(out.values.sum == docs.count())
    assert(out.keySet.subsetOf(Set("train", "val", "test")))
    assert(out("train") > out.getOrElse("val", 0L) &&
           out("train") > out.getOrElse("test", 0L))
    // deterministic: a second run assigns identically
    val again = TextAnalysis.datasetSplit(docs).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(again == out)
  }

  test("corpus curation keeps one canonical copy and lang-agreeing docs") {
    val d = Seq(
      (1L, "the and of to in is a for good text", "en"),
      (2L, "the and of to in is a for good text", "en"), // exact dup of 1
      (3L, "der und das ist ein zu mit der und das", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.curateCorpus(d, minQuality = 0.0).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map("en" -> 1L, "de" -> 1L)) // dup collapsed, langs agree
  }

  test("collocations tolerate single-token and empty documents") {
    // regression: sequence(1, 0) DESCENDS in Spark — a 1-token doc
    // must contribute zero bigrams, not crash on element_at(ts, 0)
    val d = Seq((1L, "solo", "en"), (2L, "", "en"),
      (3L, Seq.fill(6)("a b").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.collocations(d, minCount = 1L, k = 5).collect()
    assert(out.nonEmpty) // the repeated "a b" bigram survives
    assert(out.forall(r => r.getAs[String]("w1").nonEmpty))
  }

  test("langid is deterministic and prefers matching stopwords") {
    val d = Seq((1L, "der und das ist ein test", "de"),
                (2L, "the of and is a to", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "de" && out(2L) == "en")
  }

  test("fingerprint is stable under doc duplication") {
    val d = docs((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"))
    val fp = TextAnalysis.fingerprint(d).collect().map(_.getString(1))
    assert(fp.distinct.length == 1)
  }

  test("decontaminate flags train docs sharing a 5-gram with the eval set") {
    val d = docs(
      (1L, "a b c d e f g h"),   // eval (doc_id % 20 == 1)
      (2L, "x a b c d e y z"),   // shares "a b c d e"
      (3L, "p q r s t u v w"))   // clean
    val out = Dedup.decontaminate(d, col("doc_id") % 20 === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(2L, 3L)) // eval rows are not scored
    assert(out(2L) == (1L, true))
    assert(out(3L) == (0L, false))
  }

  test("semDedup drops the higher id of a within-cluster near-identical pair") {
    val e1 = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    val e2 = Array.tabulate(64)(i => if (i == 1) 1f else 0f)
    val df = Seq((0L, e1), (1L, e1), (2L, e2)).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, threshold = 0.9).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(3), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(0L) == (false, -1L))  // kept, canonical
    assert(out(1L) == (true, 0L))    // duplicate of 0
    assert(out(2L) == (false, -1L))  // different cluster, kept
  }

  test("repeated substrings finds verbatim cross-doc spans") {
    val shared = "0123456789abcdefghij" // one exact 20-char window
    val d = docs((1L, shared + " tail text here"),
      (2L, shared + " different ending"),
      (3L, "completely unrelated text z"))
    val out = Dedup.repeatedSubstrings(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) >= 1L && out(2L) >= 1L) // shared prefix window
    assert(out(3L) == 0L)
  }

  test("split leakage flags near-dup clusters that span splits") {
    // three exact copies: simhash pairs all three, one cluster; with
    // ids spread across the md5-split boundaries some split-spread is
    // deterministic for these fixed ids
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs((1L, t), (2L, t), (3L, t), (4L, "unrelated solo text"))
    val out = TextAnalysis.splitLeakage(d).collect()
    assert(out.length == 1) // one multi-doc cluster, singleton excluded
    val r = out(0)
    assert(r.getAs[Long]("cluster_id") == 1L)
    assert(r.getAs[Long]("n_docs") == 3L)
    // leaky ⇔ more than one distinct split among members
    assert(r.getAs[Boolean]("leaky") ==
      (r.getAs[Long]("n_splits") >= 2L))
  }

  test("dsir weights rank target-language docs above off-target docs") {
    val d = Seq(
      (1L, "aa bb cc", "en"), (2L, "aa bb cc", "en"),
      (3L, "xx yy zz", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.dsirWeights(d, col("lang") === "en").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == out(2L))       // identical text, identical weight
    assert(out(1L) > out(3L))        // en bag scores above de bag
  }

  test("cluster-aware split keeps every near-dup cluster in one split") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val out = TextAnalysis.clusterAwareSplit(docs)
    assert(out.count() == docs.count()) // every doc assigned once
    // leakage impossible by construction: no cluster spans splits
    val spread = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") >= 2).count()
    assert(spread == 0L)
    // and the assignment still spreads across splits overall
    assert(out.select("split").distinct().count() >= 2)
  }

  test("StreamClusters.Maintainer is the label view's incremental refresh") {
    // clusterLabels documents StreamClusters as its at-scale refresh
    // path — pin it: batching the SAME simhash near-dup edges through
    // the maintainer yields the batch view exactly (CC labels depend
    // only on the edge set, so any batch partition converges to it)
    val d = graft.sources.Tables(spark, sf, "documents")
    val edges = Dedup.simhashPairs(d, 3).select("doc_a", "doc_b")
      .localCheckpoint(true)
    val m = new graft.streaming.StreamClusters.Maintainer(spark)
    (0 until 3).foreach { i =>
      m.sink(edges.filter(pmod(col("doc_b"), lit(3)) === i), i.toLong)
    }
    val got = graft.streaming.StreamClusters
      .labelsFor(m.state(), d.select("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.clusterLabels(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // the soft-dedup weight view rides the same state: maintained
    // weights equal the batch operator's over the same edge set
    val gotW = graft.streaming.StreamClusters
      .softWeightsFor(m.state(), d.select("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val wantW = Dedup.softDedupWeights(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(gotW == wantW)
    assert(gotW.exists(_._3 > 1L), "expected at least one multi-doc cluster")
    graft.operators.OperatorCaches.releaseAll()
  }

  test("PII scan counts and redacts emails, phones, and IPv4s") {
    val d = docs(
      (1L, "reach me at jo.doe+x@mail.example.org or +44-201-555-0123 ok"),
      (2L, "server 192.168.0.1 and 10.0.0.255 hold no mail"),
      (3L, "plain clean text with no identifiers at all"))
    val out = TextAnalysis.piiScan(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1L && out(1L).getLong(2) == 1L &&
      out(1L).getLong(3) == 0L && !out(1L).getBoolean(5))
    // redacted text: both spans replaced by fixed tokens
    assert(out(1L).getLong(4) ==
      "reach me at <EMAIL> or <PHONE> ok".length.toLong)
    assert(out(2L).getLong(3) == 2L && !out(2L).getBoolean(5))
    assert(out(3L).getBoolean(5) &&
      out(3L).getLong(4) == "plain clean text with no identifiers at all".length.toLong)
  }

  test("shared cluster-label view is equivalent to per-query recompute") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val labels = Dedup.clusterLabels(d)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // the materialized view IS the batch operator's output
    assert(rows(labels) == rows(Dedup.simhashClusters(d)))
    // each consumer produces identical rows off the shared view
    assert(rows(TextAnalysis.clusterAwareSplit(d, Some(labels))) ==
      rows(TextAnalysis.clusterAwareSplit(d)))
    assert(rows(TextAnalysis.splitLeakage(d, Some(labels))) ==
      rows(TextAnalysis.splitLeakage(d)))
    // and the family summary's per-member rows match the standalone
    // results it summarizes
    val fam = TextAnalysis.clusterFamilySummary(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fam.keySet == Set("clusters", "cluster_split", "split_leakage"))
    assert(fam("clusters")._1 == labels.count())
    assert(fam("cluster_split")._1 == d.count())
    assert(fam("split_leakage")._1 ==
      TextAnalysis.splitLeakage(d).count())
    graft.operators.OperatorCaches.releaseAll()
  }

  test("source overlap matrix counts within- and cross-source dup pairs") {
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val u = (100 to 120).map(i => s"v$i").mkString(" ")
    val d = Seq((1L, t, "a"), (2L, t, "b"), (3L, t, "a"), (4L, u, "b"))
      .toDF("doc_id", "text", "source")
    val m = Dedup.sourceOverlap(d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // docs 1,2,3 identical: pairs (1,2) a-b, (1,3) a-a, (2,3) a-b
    assert(m == Map(("a", "b") -> 2L, ("a", "a") -> 1L))
  }

  test("containment flags a sub-document the symmetric Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 30).map(i => s"w$i x$i y$i").mkString(" ")
    val d = Seq((1L, small), (2L, big), (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(d, threshold = 0.8, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every shingle of doc 1 appears in doc 2 → containment(1→2) = 1
    assert(cont.exists { case (a, b, cab) => a == 1L && b == 2L && cab == 1.0 },
      s"sub-document not flagged: ${cont.mkString(",")}")
    // but the symmetric Jaccard of the same pair is far below 0.5
    val jac = Dedup.jaccardPairsBanded(d, threshold = 0.5, maxDocFreq = 10)
      .collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("containment prefix filter is lossless vs the direct self-join and audits candidates") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    // direct (pre-r6) form: full capped shingle self-join
    val sh = Dedup.shingles(docs, 3, 1000)
    val interDirect = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val nDirectPairs = interDirect.count()
    val obs = org.apache.spark.sql.Observation("containment_audit")
    // prefixFilter forced on: the size gate would pick the direct
    // path at fixture scale, and this test pins the PREFIX form
    val fast = Dedup.containmentPairs(docs, threshold = 0.8,
        audit = Some(obs), prefixFilter = Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    // equivalence against the direct form's final output; an unbounded
    // df cap makes shingles() yield exactly the uncapped n-gram sets
    val direct = {
      val full = Dedup.shingles(docs, 3, Long.MaxValue)
        .groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      interDirect
        .join(full.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("nsh", "na"), "doc_a")
        .join(full.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("nsh", "nb"), "doc_b")
        .withColumn("cont_ab", col("inter").cast("double") / col("na"))
        .withColumn("cont_ba", col("inter").cast("double") / col("nb"))
        .filter(col("cont_ab") >= 0.8 || col("cont_ba") >= 0.8)
        .select("doc_a", "doc_b", "cont_ab", "cont_ba")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSet
    }
    assert(fast == direct,
      s"prefix filter changed output: only-fast=${(fast -- direct).take(3)} " +
        s"only-direct=${(direct -- fast).take(3)}")
    // the audit observed, and the prefix join examined FEWER candidate
    // pairs than the direct self-join materializes
    val m = obs.get
    val nCand = m("n_candidates").asInstanceOf[Long]
    assert(nCand > 0 && nCand <= nDirectPairs,
      s"candidates $nCand vs direct pairs $nDirectPairs")
    assert(m("n_join_rows").asInstanceOf[Long] >= nCand)
    // the size-gated default (small corpus -> direct path) and the
    // forced direct path both match the prefix form bit-for-bit
    val viaGate = Dedup.containmentPairs(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    assert(viaGate == fast, "size-gated path diverged from prefix path")
  }

  test("vocabEncode: frequent tokens get small ids, OOV gets 0, positions hold") {
    val d = Seq((1L, "aa bb aa cc"), (2L, "aa bb zz")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabEncode(d, vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // counts: aa=3, bb=2, cc=1, zz=1 → vocab {aa→1, bb→2}; cc/zz OOV
    assert(out((1L, 0)) == 1 && out((1L, 1)) == 2 && out((1L, 2)) == 1)
    assert(out((1L, 3)) == 0) // cc out of vocab
    assert(out((2L, 2)) == 0) // zz out of vocab
  }

  test("lengthBuckets: exact power-of-two bucketing and batch ceil") {
    val d = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"),
      (4L, "a b c d"), (5L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = TextAnalysis.lengthBuckets(d, batchSize = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(0) == (1L, 1L, 1L))   // 1 token
    assert(out(1) == (2L, 5L, 1L))   // 2,3 tokens
    assert(out(2) == (1L, 4L, 1L))   // 4 tokens
    assert(out(3) == (1L, 8L, 1L))   // 8 tokens
  }

  test("substring scrub removes repeated blocks, keeps tails, rebuilds order") {
    val block = (1 to 10).map(i => s"b$i").mkString(" ")   // shared block
    val u1 = (1 to 10).map(i => s"u$i").mkString(" ")      // unique block
    val u2 = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, s"$block $u1 tail1 tail2"),   // block dropped, u1 + tail kept
      (2L, s"$u2 $block"),               // block dropped, u2 kept
      (3L, "short doc")                  // no full block: text unchanged
    ).toDF("doc_id", "text")
    val out = Dedup.substringScrub(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(1L) == (s"$u1 tail1 tail2", 2L, 1L))
    assert(out(2L) == (u2, 2L, 1L))
    assert(out(3L) == ("short doc", 0L, 0L))
    // within-doc repetition drops BOTH copies
    val rep = Seq((9L, s"$block $block extra")).toDF("doc_id", "text")
    val r9 = Dedup.substringScrub(rep).collect()(0)
    assert(r9.getString(1) == "extra" && r9.getLong(3) == 2L)
  }

  test("ngram novelty: duplicate doc reads zero, introducer reads full") {
    val a = (1 to 12).map(i => s"n$i").mkString(" ")
    val b = (20 to 32).map(i => s"m$i").mkString(" ")
    val d = Seq((1L, a), (2L, a), (3L, b), (4L, "x y")).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L)._3.contains(1.0))           // introduces everything
    assert(out(2L) == ((10L, 0L, Some(0.0))))  // verbatim re-ingest
    assert(out(3L)._3.contains(1.0))
    assert(out(4L) == ((0L, 0L, None)))        // < n tokens: null novelty
  }

  test("source length profile: exact rank-selected quantiles, no window") {
    // source A lengths 1..10 (p50 = rank 5 -> 5, p90 = rank 9 -> 9)
    // source B lengths {2, 4, 6}  (p50 = rank 2 -> 4, p90 = rank 3 -> 6)
    val rows =
      (1 to 10).map(i => (100L + i, (1 to i).map(j => s"a$j").mkString(" "),
        "A")) ++
      Seq(2, 4, 6).zipWithIndex.map { case (len, i) =>
        (200L + i, (1 to len).map(j => s"b$j").mkString(" "), "B") }
    val d = rows.toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceLengthProfile(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("A") == ((10L, 1L, 5L, 9L, 10L)))
    assert(out("B") == ((3L, 2L, 4L, 6L, 6L)))
    // the engine plan must be window-free (the straggler guard)
    val plan = TextAnalysis.sourceLengthProfile(d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "per-source window crept back in")
  }

  test("k-center on a corpus smaller than k selects everything, no crash") {
    val v = (0 until 64).map(_.toFloat / 64).toArray
    val small = Seq(3L, 7L, 11L).map(i =>
      (i, v.map(x => x + i * 0.01f))).toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(small, k = 8).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).toSet == Set(3L, 7L, 11L))
    val assign = Similarity.kCenterAssign(small, k = 8).collect()
    assert(assign.length == 3)
    val empty = small.filter(col("vec_id") < 0)
    assert(Similarity.kCenterCoreset(empty, k = 8).collect().isEmpty)
    assert(Similarity.kCenterAssign(empty, k = 8).collect().isEmpty)
  }

  test("k-center assignment is the per-vector argmin over the picks") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val picks = Similarity.kCenterCoreset(emb, k = 8).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val out = Similarity.kCenterAssign(emb, k = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val n = emb.count()
    assert(out.size == n, "every vector must be assigned")
    // centers assign to themselves (own distance is the floor)
    picks.foreach { case (_, cid) => assert(out(cid)._1 == cid) }
    // argmin check against an in-Scala recompute on a sample
    val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      val dt = a.zip(b).map { case (x, y) => x * y }.sum
      1.0 - dt / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    vecs.keys.take(50).foreach { id =>
      val best = picks.map { case (rd, cid) =>
        (cosD(vecs(id), vecs(cid)), rd, cid) }.min
      assert(out(id)._1 == best._3, s"vec $id assigned to ${out(id)._1}")
    }
  }

  test("streamed novelty over ordered batches equals the batch operator") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val batch = Dedup.ngramNovelty(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toMap
    // parity requires id-ordered ingest (scaladoc contract): thirds
    var st = graft.streaming.StreamNovelty.emptyState(spark)
    val streamed = scala.collection.mutable.Map[Long, (Long, Long, Option[Any])]()
    val ids = d.select("doc_id").collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val parts = Seq(
      d.filter(col("doc_id") < cuts(0)),
      d.filter(col("doc_id") >= cuts(0) && col("doc_id") < cuts(1)),
      d.filter(col("doc_id") >= cuts(1)))
    parts.foreach { p =>
      val (out, st2) = graft.streaming.StreamNovelty.ingest(st, p, n = 3)
      st = st2
      out.collect().foreach(r => streamed(r.getLong(0)) =
        (r.getLong(1), r.getLong(2), Option(r.get(3))))
    }
    assert(streamed.size == batch.size)
    batch.foreach { case (id, exp) =>
      assert(streamed(id) == exp, s"doc $id diverged") }
  }

  test("bloom decontamination is bit-identical to the exact screen") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val evalPred = col("doc_id") % 20 === 1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getBoolean(2))).toSet
    val exact = rows(Dedup.decontaminate(d, evalPred))
    val bloom = rows(Dedup.decontaminateBloom(d, evalPred))
    assert(bloom == exact, "Bloom-prefiltered screen diverged from exact")
    assert(exact.exists(_._3), "corpus should have contaminated docs")
  }

  test("temperature mix: weights sum to 1 and flatten vs raw shares") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val out = TextAnalysis.temperatureMix(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-9)
    // α = 1/2 flattening: the min/max WEIGHT ratio must sit strictly
    // between the min/max raw-token-share ratio and uniform (1.0)
    val masses = out.map(_._3.toDouble)
    val rawRatio = masses.min / masses.max
    val wRatio = out.map(_._4).min / out.map(_._4).max
    assert(wRatio > rawRatio - 1e-12 && wRatio <= 1.0)
    if (masses.min < masses.max) assert(wRatio > rawRatio)
    // epochs is exactly budget·w/tokens for every row
    out.foreach { case (_, _, nTok, w, ep) =>
      assert(ep == 100000.0 * w / nTok.toDouble) }
  }

  test("knn graph: dense per-src ranks, k-bounded, mutual flag exact") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val edges = Similarity.knnGraph(emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getBoolean(4)))
    val bySrc = edges.groupBy(_._1)
    bySrc.foreach { case (src, es) =>
      val rns = es.map(_._4).sorted
      assert(rns.head == 1 && rns.last == rns.length && rns.length <= 5,
        s"src $src ranks not dense-1..k: ${rns.mkString(",")}")
      // ranks follow cosine desc with dst tie-break
      val keys = es.sortBy(_._4).map(e => (-e._3, e._2)).toList
      assert(keys == keys.sorted)
    }
    val pairSet = edges.map(e => (e._1, e._2)).toSet
    edges.foreach { e =>
      assert(e._5 == pairSet.contains((e._2, e._1)),
        s"mutual flag wrong for ${(e._1, e._2)}") }
    assert(edges.exists(_._5), "expected at least one mutual edge")
  }

  test("k-center coreset: min-id seed, distinct picks, non-increasing radii") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val out = Similarity.kCenterCoreset(emb, k = 8).collect()
      .sortBy(_.getInt(0))
    assert(out.length == 8)
    assert(out.map(_.getLong(1)).distinct.length == 8)
    val minId = emb.agg(min(col("vec_id"))).collect()(0).getLong(0)
    assert(out.head.getLong(1) == minId && out.head.isNullAt(2))
    val radii = out.tail.map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radii increased: ${radii.mkString(",")}")
    // round 2 is the true farthest point from the seed
    val seedV = emb.filter(col("vec_id") === minId)
      .select(Similarity.asDouble(col("embedding"))).collect()(0)
      .getSeq[Double](0).toArray
    val allV = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      val dt = a.zip(b).map { case (x, y) => x * y }.sum
      1.0 - dt / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val far = allV.filter(_._1 != minId)
      .map { case (id, v) => (cosD(seedV, v), id) }
      .maxBy { case (dd, id) => (dd, -id.toDouble) }
    assert(out(1).getLong(1) == far._2)
  }

  test("ivfAutoNlist is max(16, ceil(sqrt(N)))") {
    assert(Similarity.ivfAutoNlist(0L) == 16)
    assert(Similarity.ivfAutoNlist(256L) == 16)
    assert(Similarity.ivfAutoNlist(257L) == 17)
    assert(Similarity.ivfAutoNlist(10000L) == 100)
    assert(Similarity.ivfAutoNlist(1000000L) == 1000)
    assert(Similarity.ivfAutoNlist(100000000000L) == 316228)
  }

  // 300 deterministic distinct vectors: auto nlist = ceil(sqrt(300)) = 18,
  // so the default codebook MUST be wider than the old fixed 16 — the
  // round-12 scale trap (fixed codebook -> quadratic candidate growth).
  private def autoCorpus = (0L until 300L).map(i =>
      (i, Array.tabulate(64)(j => (((i * 131 + j * 17) % 97).toFloat / 97f))))
    .toDF("vec_id", "embedding")

  test("semDedup default auto-sizes the codebook via ivfAutoNlist") {
    val df = autoCorpus
    val auto = Similarity.semDedup(df, threshold = 0.99)
    val pinned = Similarity.semDedup(df, threshold = 0.99,
      nlist = Similarity.ivfAutoNlist(300L))
    assert(auto.collect().toSet == pinned.collect().toSet)
    // behavioral proof the codebook is wider than the old fixed 16:
    // pivots are vec_id < 18 and each pivot is its own nearest pivot
    val maxCluster = auto.agg(max(col("cluster_id"))).collect()(0).getLong(0)
    assert(maxCluster >= 16, s"auto codebook not wider than 16: $maxCluster")
    val fixed16 = Similarity.semDedup(df, threshold = 0.99, nlist = 16)
      .agg(max(col("cluster_id"))).collect()(0).getLong(0)
    assert(fixed16 <= 15)
  }

  test("knnGraph default auto-sizes the codebook via ivfAutoNlist") {
    val df = autoCorpus
    val auto = Similarity.knnGraph(df, k = 3)
    val pinned = Similarity.knnGraph(df, k = 3,
      nlist = Similarity.ivfAutoNlist(300L))
    assert(auto.collect().toSet == pinned.collect().toSet)
  }

  test("decontaminate scrub: removes eval-overlapping blocks, keeps tail") {
    // eval doc (id 21 — 21 % 20 = 1) shares tokens e1..e5 with train
    // doc 2's SECOND block; doc 4 is clean
    val evalText = (1 to 5).map(i => s"e$i").mkString(" ")
    val block1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val block2 = (1 to 5).map(i => s"e$i").mkString(" ") + " " +
      (1 to 5).map(i => s"b$i").mkString(" ")
    val tail = "t1 t2 t3"
    val d = docs(
      (21L, evalText),
      (2L, s"$block1 $block2 $tail"),
      (4L, s"$block1 $tail"))
    val out = Dedup.decontaminateScrub(d, col("doc_id") % 20 === 1)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(2L, 4L)) // eval doc never emitted
    assert(out(2L) == ((s"$block1 $tail", 2L, 1L))) // block2 scrubbed
    assert(out(4L) == ((s"$block1 $tail", 1L, 0L))) // untouched
  }

  test("decontaminate scrub: short doc is all tail; blockTokens>=n enforced") {
    val d = docs((21L, "e1 e2 e3 e4 e5"), (2L, "short doc only"))
    val out = Dedup.decontaminateScrub(d, col("doc_id") % 20 === 1)
      .collect()
    assert(out.length == 1 && out(0).getString(1) == "short doc only"
      && out(0).getLong(2) == 0L)
    intercept[IllegalArgumentException] {
      Dedup.decontaminateScrub(d, col("doc_id") % 20 === 1,
        n = 5, blockTokens = 4)
    }
  }

  test("winnowing: shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "qrstuvwxyz0123456" // 17 chars = k + w - 1 at k=8, w=10
    val a = s"aaaaaaaaaaaa $shared bbbbbbbbbbbb"
    val b = s"cccccccccccc $shared dddddddddddd"
    val fps = TextAnalysis.winnowFingerprints(docs((1L, a), (2L, b)))
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    // density: distinct selections are a small fraction of positions
    assert(fps(1L).size < a.length - 7)
  }

  test("winnowing: docs shorter than k+w-1 emit nothing") {
    val out = TextAnalysis.winnowFingerprints(
      docs((1L, "0123456789abcdef"))) // 16 chars -> npos 9 < w
    assert(out.count() == 0)
  }

  test("top ngrams: counts every occurrence, caps at k, count-desc order") {
    val d = Seq(
      (1L, "x y x y x y", "s1"),   // "x y" x3, "y x" x2
      (2L, "p q", "s1"),
      (3L, "m n m n", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.topNgramsBySource(d, n = 2, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val s1 = out.filter(_._1 == "s1").sortBy(_._4)
    assert(s1.map(t => (t._2, t._3)).toSeq == Seq(("x y", 3L), ("y x", 2L)))
    assert(out.count(_._1 == "s2") == 2) // "m n" x2 then "n m" x1
  }

  test("winnow overlap: shared-substring pair found, df cap silences boilerplate") {
    val shared = "qrstuvwxyz0123456789" // > k+w-1 chars
    val d = docs(
      (1L, s"aaaaaaaaaaaa $shared bbbbbbbbbbbb"),
      (2L, s"cccccccccccc $shared dddddddddddd"),
      (3L, "eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"))
    val pairs = TextAnalysis.winnowOverlap(d, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // a fingerprint in MORE docs than the cap pairs nothing: the same
    // shared text in 3 docs with cap 2 yields zero pairs
    val three = docs((1L, s"x $shared x"), (2L, s"y $shared y"),
      (3L, s"z $shared z"))
    assert(TextAnalysis.winnowOverlap(three, minShared = 1,
      maxDocFreq = 2).count() == 0)
  }

  test("source minhash sim: identical sources read 1.0, disjoint read 0.0") {
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = Seq((1L, a, "s1"), (2L, a, "s2"), (3L, b, "s3"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceMinhashSim(d)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("s1", "s2")) == ((8L, 1.0))) // same grams -> all slots match
    assert(out(("s1", "s3")) == ((0L, 0.0))) // disjoint -> none
    assert(out(("s2", "s3")) == ((0L, 0.0)))
  }

  test("emb dim profile: exact per-dimension stats on known vectors") {
    val d = Seq(
      (1L, Array(1.0f, 0.0f, -2.0f)),
      (2L, Array(3.0f, 0.0f, 4.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.embDimProfile(d).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet == Set(0, 1, 2))
    assert(rows(0).getLong(1) == 2L && rows(0).getDouble(2) == 1.0 &&
      rows(0).getDouble(3) == 3.0 && rows(0).getDouble(4) == 2.0 &&
      rows(0).getLong(5) == 0L)
    assert(rows(1).getDouble(4) == 0.0 && rows(1).getLong(5) == 2L)
    assert(rows(2).getDouble(2) == -2.0 && rows(2).getDouble(4) == 1.0)
  }

  test("streamed winnow overlap over UNORDERED batches equals the batch operator") {
    val d = graft.sources.Tables(spark, sf, "documents")
    // the row-exact contract requires CAP-FREE data (the scaladoc's
    // documented divergence: the stream caps on df-so-far, the batch
    // on final df — this corpus has fps crossing df=100 mid-ingest,
    // observed as ~1.6% extra early pairs at the default cap). A cap
    // above the corpus size makes both sides cap-free and the
    // equality exact.
    val cap = 1000L
    val batch = TextAnalysis.winnowOverlap(d, maxDocFreq = cap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.operators.OperatorCaches.releaseAll()
    // the parity contract is ANY ingest order (scaladoc) — prove it
    // with an interleaved split (doc_id mod 3), not ordered thirds
    var st = graft.streaming.StreamWinnow.emptyState(spark)
    val streamed = scala.collection.mutable.Map[(Long, Long), Long]()
    (0 to 2).foreach { m =>
      val (out, st2) = graft.streaming.StreamWinnow.ingest(
        st, d.filter(col("doc_id") % 3 === m), maxDocFreq = cap)
      st = st2
      out.collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(!streamed.contains(key), s"pair $key emitted twice")
        streamed(key) = r.getLong(2)
      }
      graft.operators.OperatorCaches.releaseAll()
    }
    assert(streamed.size == batch.size,
      s"stream ${streamed.size} pairs vs batch ${batch.size}")
    batch.foreach { case (k, n) => assert(streamed(k) == n, s"pair $k") }
    // store = every ingested (doc_id, fp) row
    assert(st.fpRows ==
      TextAnalysis.winnowFingerprints(d).count())
  }

  test("bpe training: hand-computable merges, greedy run parity on same-char runs") {
    // corpus: "abab" x3, "aaaa" x2, "ab" x1
    //   chars: round 1 pairs — (a,b): 2*3 + 1 = 7; (b,a): 1*3 = 3;
    //          (a,a): 3*2 = 6   -> best (a,b) cnt 7
    //   after merge: [ab,ab] x3, [a,a,a,a] x2, [ab] x1
    //   round 2: (ab,ab)=3, (a,a)=6 -> best (a,a) cnt 6
    //   greedy parity on the 4-run: [aa,aa] (NOT [a,aa,a])
    //   round 3: (ab,ab)=3, (aa,aa)=2 -> best (ab,ab) cnt 3
    val d = docs(
      (1L, "abab abab abab aaaa aaaa ab"))
    val m = TextAnalysis.bpeTrain(d, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "b", 7L), (2, "a", "a", 6L),
      (3, "ab", "ab", 3L)))
    // odd run: "aaaaa" pairs (a,a) = 4 adjacencies -> greedy merge ->
    // [aa,aa,a]; round 2 ties (aa,aa)=1 vs (aa,a)=1, broken by
    // rgt asc ("a" < "aa") -> (aa,a)
    val m2 = TextAnalysis.bpeTrain(docs((1L, "aaaaa")), rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m2(0) == ((1, "a", "a", 4L)))
    assert(m2(1) == ((2, "aa", "a", 1L)))
    // exhaustion: two 2-char words yield exactly 2 merges then stop,
    // no phantom rows for the remaining 3 requested rounds
    assert(TextAnalysis.bpeTrain(docs((1L, "ab cd")), rounds = 5)
      .count() == 2)
  }

  test("bpe encode: token counts under the learned merges, exact fertility") {
    // same corpus as the trainer test; after merges (a,b),(a,a),(ab,ab):
    //   abab -> [abab] 1 tok; aaaa -> [aa,aa] 2; ab -> [ab] 1
    //   doc: 3x1 + 2x2 + 1 = 8 bpe tokens, 6 words, 22 chars
    val out = TextAnalysis.bpeEncode(
      docs((1L, "abab abab abab aaaa aaaa ab"))).collect()(0)
    assert(out.getLong(1) == 6L && out.getLong(2) == 8L &&
      out.getLong(3) == 22L)
    assert(out.getDouble(4) == 22.0 / 8.0)
  }

  test("mask tokens: deterministic, counts exact, pct=0 is identity") {
    val d = docs((1L, (1 to 200).map(i => s"tok$i").mkString(" ")))
    val a = TextAnalysis.maskTokens(d).collect()(0)
    val b = TextAnalysis.maskTokens(d).collect()(0)
    assert(a.getString(1) == b.getString(1)) // hash-coin, not RNG
    assert(a.getLong(3) ==
      a.getString(1).split(" ").count(_ == "[MASK]"))
    assert(a.getLong(3) > 0 && a.getLong(3) < 80) // ~15% of 200
    val id = TextAnalysis.maskTokens(d, pct = 0).collect()(0)
    assert(id.getString(1) == d.collect()(0).getString(1)
      && id.getLong(3) == 0L)
  }
}
