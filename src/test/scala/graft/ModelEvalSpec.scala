package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ModelEval

class ModelEvalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // two well-separated clusters on axes 1 and 2 (plus distinct ids so
  // the IVF codebook — the first vectors — spans both clusters)
  private def twoClusters(dim: Int = 8) = {
    def vec(axis: Int, eps: Float) = {
      val a = Array.fill(dim)(0.0f)
      a(axis) = 1.0f
      a((axis + 1) % dim) = eps
      a
    }
    (0 until 20).map { i =>
      val axis = i % 2 // even ids cluster on axis 0, odd on axis 1
      (i.toLong, vec(axis, 0.01f * (i / 2)), axis)
    }.toDF("vec_id", "embedding", "label")
  }

  test("knnLabel assigns the surrounding cluster's label") {
    val emb = twoClusters()
    val out = ModelEval.knnLabel(emb, col("vec_id") >= 18, k = 3,
        nlist = 2, nprobe = 1, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(18L) == 0) // even id → axis-0 cluster
    assert(out(19L) == 1)
  }

  test("knnLabel majority is deterministic on vote ties (smaller label wins)") {
    // 1 query + 2 neighbors of label 1 + 2 of label 0, equidistant-ish:
    // force a 2-2 tie at k=4 by symmetric geometry
    def v(parts: (Int, Float)*) = {
      val a = Array.fill(4)(0.0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val emb = Seq(
      (0L, v(0 -> 1.0f), 9),              // query (label ignored)
      (1L, v(0 -> 1.0f, 1 -> 0.1f), 1),
      (2L, v(0 -> 1.0f, 1 -> -0.1f), 1),
      (3L, v(0 -> 1.0f, 2 -> 0.1f), 0),
      (4L, v(0 -> 1.0f, 2 -> -0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = ModelEval.knnLabel(emb, col("vec_id") === 0, k = 4,
      nlist = 1, nprobe = 1, dim = 4).collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 0) // tie 2-2 → smaller label
    assert(out(0).getLong(2) == 2L)
  }

  test("calibration bins partition the corpus and rates are exact ratios") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val out = ModelEval.calibrationBins(emb).collect()
    assert(out.map(_.getLong(1)).sum == emb.count())
    out.foreach { r =>
      val (bin, n, pos, rate) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(bin >= 0 && bin <= 9)
      assert(pos <= n)
      assert(rate == pos.toDouble / n)
    }
  }

  test("precision/recall confusion counts add up at every threshold") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val total = emb.count()
    val actualPos = emb.filter(col("label") % 2 === 0).count()
    val out = ModelEval.prAtThresholds(emb).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp + fn == actualPos) // every actual positive is tp or fn
      assert(tp + fp <= total)
      assert(r.getDouble(4) == tp.toDouble / math.max(tp + fp, 1L))
      assert(r.getDouble(5) == tp.toDouble / math.max(actualPos, 1L))
    }
    // monotonicity: raising the threshold can't increase recall
    val byT = out.sortBy(_.getDouble(0)).map(_.getDouble(5))
    assert(byT.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("preferencePairs: best/worst per group, ties split, singletons drop") {
    val e = Seq(
      (1L, 1L, 5.0), (1L, 2L, 9.0), (1L, 3L, 1.0),
      (2L, 4L, 3.0), // singleton: self-pairs, must drop
      (3L, 5L, 7.0), (3L, 6L, 7.0) // all-tied group still yields a pair
    ).toDF("user_id", "event_id", "value")
    val out = graft.operators.ModelEval.preferencePairs(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((2L, 9.0, 3L, 1.0, 8.0)))
    assert(out(3L) == ((6L, 7.0, 5L, 7.0, 0.0)),
      "opposite id tiebreaks must pick distinct events on a full tie")
    assert(!out.contains(2L))
  }
}
