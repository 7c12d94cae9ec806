package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Joins, TopN}

/** Property-based checks for the hand-built operators whose logic is
  * NOT derived from Catalyst primitives — the as-of carry-forward
  * window and the custom TopK physical operator — against brute-force
  * references on random keyed timelines. Each trial runs real Spark
  * jobs, so the trial count is modest (the domains are tiny: 4 keys ×
  * 21 instants, so collisions/ties appear every few trials).
  */
class OperatorPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  private val genEvents = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 20L)
      v <- Gen.choose(1, 1000)
    } yield (key, ts, v.toDouble))
  } yield rows

  test("asOfJoin equals the brute-force latest-at-or-before on random data") {
    check(Prop.forAll(genEvents, genEvents) { (lrows, rrows0) =>
      // right side must be unique per (key, ts): keep max value
      val rrows = rrows0.groupBy(r => (r._1, r._2))
        .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
      val left = lrows.zipWithIndex
        .map { case ((k, t, v), i) => (i.toLong, k, new Timestamp(t * 1000), v) }
      val right = rrows
        .map { case (k, t, v) => (k, new Timestamp(t * 1000), v) }
      val out = Joins.asOfJoin(
          left.toDF("event_id", "user_id", "ts", "value"),
          right.toDF("user_id", "ts", "profile_value"),
          "user_id", "ts", "profile_value")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double]))
        .toMap
      left.forall { case (id, k, ts, _) =>
        val expected = rrows.filter(r => r._1 == k && r._2 * 1000 <= ts.getTime)
          .sortBy(_._2).lastOption.map(_._3)
        out(id) == expected
      }
    })
  }

  test("native TopK equals sort-take per key on random data") {
    check(Prop.forAll(genEvents, Gen.choose(1, 5)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((key, t, v), i) =>
          (i.toLong, key, new Timestamp(t * 1000), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val native = TopN.recentPerKeyNative(df, "user_id", "ts", "event_id", k)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // .toSeq before flatMap: flatMapping a Map into (key, id) pairs
      // would rebuild a Map and collapse to one pair per key
      val expected = rows.zipWithIndex
        .map { case ((key, t, _), i) => (key, t, i.toLong) }
        .groupBy(_._1).toSeq
        .flatMap { case (key, g) =>
          g.sortBy(r => (-r._2, r._3)).take(k).map(r => (key, r._3))
        }.toSet
      native == expected
    })
  }

  test("TopK partial-phase key-overflow fallback preserves results") {
    // maxPartialKeys=1: all but one key per partition pass through the
    // partial phase untrimmed; the final phase must still produce the
    // exact per-key top-k
    check(Prop.forAll(genEvents, Gen.choose(1, 5)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((key, t, v), i) =>
          (i.toLong, key, new Timestamp(t * 1000), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val capped = TopN.topPerKeyNative(df, "user_id", "ts", "event_id", k,
          maxPartialKeys = 1)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val uncapped = TopN.recentPerKeyNative(df, "user_id", "ts",
          "event_id", k)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      capped == uncapped
    })
  }

  test("tree-model DSL: Catalyst rendering equals direct interpretation") {
    import graft.ml.DeterministicModels._
    val genPred: Gen[Pred] = Gen.oneOf(
      Gen.choose(1.0, 2000.0).map(x => AmountGt(math.floor(x))),
      Gen.choose(1.0, 2000.0).map(x => AmountLt(math.floor(x))),
      Gen.const(IsNight), Gen.const(IsWeekend),
      Gen.const(RoundAmount(10.0)))
    def genNode(depth: Int): Gen[Node] =
      if (depth <= 0) Gen.choose(0, 100).map(v => Leaf(v / 100.0))
      else Gen.frequency(
        1 -> Gen.choose(0, 100).map(v => Leaf(v / 100.0)),
        3 -> (for {
          p <- genPred; y <- genNode(depth - 1); n <- genNode(depth - 1)
        } yield Split(p, y, n)))
    // 2024-01-01 is a Monday; day 0-6 sweeps the week, hour 0-23
    def evalPred(p: Pred, amount: Double, day: Int, hour: Int): Boolean =
      p match {
        case AmountGt(x) => amount > x
        case AmountLt(x) => amount < x
        case IsNight => hour <= 6 || hour >= 22
        case IsWeekend => day == 5 || day == 6 // Sat/Sun from Monday
        case RoundAmount(m) => amount % m == 0.0
      }
    def evalNode(n: Node, amount: Double, day: Int, hour: Int): Double =
      n match {
        case Leaf(v) => v
        case Split(p, y, nn) =>
          if (evalPred(p, amount, day, hour)) evalNode(y, amount, day, hour)
          else evalNode(nn, amount, day, hour)
      }
    val genRow = for {
      cents <- Gen.choose(0L, 200000L)
      day <- Gen.choose(0, 6)
      hour <- Gen.choose(0, 23)
    } yield (cents / 100.0, day, hour)
    check(Prop.forAll(genNode(3), Gen.listOfN(8, genRow)) { (tree, rows) =>
      val df = rows.zipWithIndex.map { case ((amt, day, hour), i) =>
        (i.toLong, amt,
          java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00"))
      }.toDF("id", "amount", "ts")
      val out = df.select($"id", render(tree, $"amount", $"ts").as("p"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.zipWithIndex.forall { case ((amt, day, hour), i) =>
        out(i.toLong) == evalNode(tree, amt, day, hour)
      }
    })
  }

  test("connectedComponents equals union-find on random graphs") {
    // iterative min-label propagation vs a classic in-memory
    // union-find — random graphs hit cliques, chains, forests, and
    // singletons in the same trial
    val genGraph = for {
      nNodes <- Gen.choose(1, 30)
      nEdges <- Gen.choose(0, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(1L, nNodes.toLong)
        b <- Gen.choose(1L, nNodes.toLong)
      } yield (a, b))
    } yield (nNodes, edges.filter(e => e._1 != e._2))
    check(Prop.forAll(genGraph) { case (nNodes, edges) =>
      val nodes = (1L to nNodes.toLong).toList
      // reference: union-find with path compression
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(x => x -> find(x)).toMap
      val pairsDf =
        if (edges.isEmpty)
          Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
        else edges.toDF("doc_a", "doc_b")
      val got = graft.operators.Dedup
        .connectedComponents(pairsDf, nodes.toDF("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    })
  }

  test("StreamDedup plan equals incrementalDedup on random corpora") {
    // the streaming twin's plan is pure DataFrame ops — run it in
    // batch over random doc sets and pin status-for-status parity
    // with the one-pass batch operator (the StreamingSpec
    // single-example parity, generalized: random corpus/batch splits
    // hit exact dups, band-key near-dups, fresh docs, and
    // too-short-to-shingle docs in the same trial)
    val genDocs = for {
      nCorpus <- Gen.choose(1, 8)
      nBatch <- Gen.choose(1, 6)
      texts <- Gen.listOfN(nCorpus + nBatch, for {
        n <- Gen.choose(1, 12) // < 3 tokens => no shingles
        ws <- Gen.listOfN(n, Gen.choose(1, 9).map(i => s"w$i"))
      } yield ws.mkString(" "))
    } yield (nCorpus, texts)
    check(Prop.forAll(genDocs) { case (nCorpus, texts) =>
      val rows = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val corpus = rows.take(nCorpus).toDF("doc_id", "text")
      val stream = rows.drop(nCorpus).toDF("doc_id", "text")
      val twin = graft.streaming.StreamDedup.dedupStream(stream,
          graft.streaming.StreamDedup.exactIndex(corpus),
          graft.streaming.StreamDedup.bandIndex(corpus))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = graft.operators.Dedup.incrementalDedup(
          rows.toDF("doc_id", "text"), col("doc_id") > nCorpus.toLong)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      twin == batch
    })
  }

  test("containmentPairs: prefix and direct paths agree on random corpora") {
    // the prefix filter's losslessness argument is the subtlest math
    // in the dedup family (rarest-first prefix of length msh−⌊t·na⌋+1
    // over CAPPED shingle sets against UNCAPPED size denominators);
    // pin it on random corpora across thresholds AND df caps — the
    // cap interplay is where a wrong prefix length would lose pairs
    val genCase = for {
      nDocs <- Gen.choose(4, 12)
      cap <- Gen.oneOf(3L, 5L, 1000L)
      t <- Gen.oneOf(0.5, 0.7, 0.9)
      texts <- Gen.listOfN(nDocs, for {
        n <- Gen.choose(3, 25)
        ws <- Gen.listOfN(n, Gen.choose(1, 12).map(i => s"w$i"))
      } yield ws.mkString(" "))
    } yield (cap, t, texts)
    check(Prop.forAll(genCase) { case (cap, t, texts) =>
      val docs = texts.zipWithIndex
        .map { case (s, i) => ((i + 1).toLong, s) }.toDF("doc_id", "text")
      def run(prefix: Boolean) = graft.operators.Dedup
        .containmentPairs(docs, threshold = t, maxDocFreq = cap,
          prefixFilter = Some(prefix))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSet
      run(true) == run(false)
    })
  }

  test("incremental clusters match batch CC under random batches and compaction") {
    // the streaming cluster maintainer's exactness claim, stressed:
    // random edge batches over a small node universe (collisions,
    // merges, re-ingested duplicate edges every few trials), with
    // compaction randomly interleaved — final labels must equal the
    // batch fixpoint over everything ingested
    val genRun = for {
      nBatches <- Gen.choose(2, 4)
      batches <- Gen.listOfN(nBatches, for {
        n <- Gen.choose(0, 6)
        edges <- Gen.listOfN(n, for {
          a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
        } yield (a, b))
        doCompact <- Gen.oneOf(true, false)
      } yield (edges.filter(e => e._1 != e._2), doCompact))
    } yield batches
    check(Prop.forAll(genRun) { batches =>
      import graft.streaming.StreamClusters
      var st = StreamClusters.emptyState(spark)
      val all = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      batches.foreach { case (edges, doCompact) =>
        if (doCompact) st = StreamClusters.compact(st)
        val df = if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
                 else edges.toDF("doc_a", "doc_b")
        st = StreamClusters.ingest(st, df)
        all ++= edges
      }
      val nodes = (1L to 12L).toList
      val pairsDf = if (all.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
                    else all.toSeq.toDF("doc_a", "doc_b")
      val expect = graft.operators.Dedup
        .connectedComponents(pairsDf, nodes.toDF("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = StreamClusters.labelsFor(st, nodes.toDF("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    })
  }

  test("zorderKey round-trips: deinterleaving the key recovers (x, y)") {
    // driver-side property over the whole 5-bit grid per trial is
    // overkill — random points, full bit width
    val genPoint = for {
      x <- Gen.choose(0L, 255L)
      y <- Gen.choose(0L, 255L)
    } yield (x, y)
    check(Prop.forAll(Gen.listOfN(24, genPoint)) { pts =>
      val rows = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.operators.Layout.zorderKey(col("x"), col("y"), 8).as("z"))
        .collect()
      rows.forall { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val xb = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).reduce(_ | _)
        val yb = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
        xb == x && yb == y
      }
    })
  }

  test("prefixSum matches the sequential scan on random value sequences") {
    val genVals = for {
      n <- Gen.choose(1, 60)
      vs <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
    } yield vs
    check(Prop.forAll(genVals) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = graft.operators.Layout
        .prefixSum(df.repartition(5), Seq("id"), "v", "run")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val expected = vs.zipWithIndex
        .scanLeft(((-1L), 0L)) { case ((_, acc), (v, i)) => (i.toLong, acc + v) }
        .drop(1).toMap
      got == expected
    })
  }

  test("negativeSamples never intersect observed positives on random graphs") {
    val genInter = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        it <- Gen.choose(1L, 8L)
      } yield (u, it))
    } yield rows
    check(Prop.forAll(genInter) { rows =>
      val df = rows.toDF("u", "it")
      val neg = graft.operators.FeatureEng
        .negativeSamples(df, "u", "it", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pos = rows.toSet
      neg.intersect(pos).isEmpty &&
        neg.forall { case (_, it) => rows.exists(_._2 == it) }
    })
  }

  test("asOfJoinNative emits the same rows as the window asOfJoin") {
    check(Prop.forAll(genEvents, genEvents) { (lrows, rrows0) =>
      val rrows = rrows0.groupBy(r => (r._1, r._2))
        .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
      val left = lrows.zipWithIndex
        .map { case ((k, t, v), i) => (i.toLong, k, new Timestamp(t * 1000), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val right = rrows
        .map { case (k, t, v) => (k, new Timestamp(t * 1000), v) }
        .toDF("user_id", "ts", "profile_value")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getDouble(3), Option(r.get(4)))).toSet
      rows(Joins.asOfJoinNative(left, right,
          "user_id", "ts", "profile_value")) ==
        rows(Joins.asOfJoin(left, right, "user_id", "ts", "profile_value"))
    })
  }

  private val genGraph = for {
    n <- Gen.choose(2, 10)
    edges <- Gen.listOf(for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  test("triangleCount equals the brute-force triple count on random graphs") {
    check(Prop.forAll(genGraph) { edges =>
      edges.isEmpty || {
        val e = edges.toSet
        val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
        val brute = nodes.combinations(3).count { case Seq(a, b, c) =>
          e((a, b)) && e((b, c)) && e((a, c)) }
        val got = Joins.triangleCount(edges.toDF("src_a", "src_b"))
          .collect().head
        got.getLong(0) == edges.size.toLong &&
          got.getLong(2) == brute.toLong
      }
    })
  }

  test("eventTransitions: row totals and counts match the brute chain") {
    check(Prop.forAll(genEvents) { rows =>
      // unique (key, ts) per user so the chain order is unambiguous
      // without relying on the event_id tiebreak (tested separately)
      val uniq = rows.groupBy(r => (r._1, r._2))
        .map { case ((k, t), vs) => (k, t, vs.head._3) }.toSeq
      val df = uniq.zipWithIndex.map { case ((k, t, v), i) =>
        (k, i.toLong, if (v < 500) "a" else "b", new Timestamp(t * 1000)) }
      val out = graft.operators.Behavior.eventTransitions(
          df.toDF("user_id", "event_id", "event_type", "ts"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val brute = df.groupBy(_._1).values.flatMap { evs =>
        evs.sortBy(e => (e._4.getTime, e._2)).map(_._3)
          .sliding(2).filter(_.size == 2).map(p => (p(0), p(1)))
      }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      out == brute
    })
  }
}
