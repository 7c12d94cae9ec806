package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, TextAnalysis}

/** Ranked-retrieval + mixture-curation semantics. */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("inverted index: postings recover exact term positions") {
    val d = docs((1L, "a b a c"), (2L, "c c b"))
    val idx = Retrieval.invertedIndex(d, Seq("a", "c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(idx == Set(("a", 1L, 0), ("a", 1L, 2), ("c", 1L, 3),
      ("c", 2L, 0), ("c", 2L, 1)))
  }

  test("bm25: more matched terms rank higher; saturation bounds tf") {
    // d1 holds both query terms, d2 one (repeated), d3 none; filler
    // equalizes lengths so dl-normalization doesn't decide the order
    val d = docs(
      (1L, "q1 q2 x x x x"),
      (2L, "q1 q1 x x x x"),
      (3L, "x y z w v u"))
    val out = Retrieval.bm25TopK(d, Seq("q1", "q2"), k = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(3L), "termless doc must not score")
    // two distinct terms beat one term twice: per-term tf saturates
    // at k1+1 while a second term adds a fresh idf block
    assert(out(1L) > out(2L))
    assert(out(2L) > 0.0)
  }

  test("bm25 on the corpus: scores positive, k rows, sorted output") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val rows = Retrieval.bm25TopK(d, Seq("spark", "join", "window"), 20)
      .collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }

  test("budget select: per-domain budget respected, greedy longest-first") {
    val d = graft.sources.Tables(spark, sf, "documents")
    val budget = 2000L
    val sel = TextAnalysis.budgetSelect(d, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byLang = sel.groupBy(_._2)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rows) =>
      val total = rows.map(_._3).sum
      assert(total <= budget, s"$lang exceeded budget: $total")
      assert(rows.map(_._4).max == total) // cum_tok is the running sum
      // greedy: every selected doc is at least as long as any
      // unselected doc of the same lang OR adding the longest
      // unselected would break the budget
      val selectedIds = rows.map(_._1).toSet
      val unselected = d.filter(col("lang") === lang)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filterNot(x => selectedIds(x._1))
      unselected.headOption.foreach { _ =>
        val maxUnsel = unselected.map(_._2).max
        val minSel = rows.map(_._3).min
        assert(minSel >= maxUnsel || total + maxUnsel > budget)
      }
    }
  }

  test("phrase search: aligned posting intersection finds exact occurrences only") {
    val d = docs(
      (1L, "fast table hash scan table hash join"),   // 2 occurrences
      (2L, "table scan hash"),                        // terms present, never adjacent
      (3L, "hash table"),                             // reversed — no match
      (4L, "table hash"),                             // 1 occurrence at pos 0
      (5L, "nothing relevant"))
    val out = Retrieval.phraseSearch(d, Seq("table", "hash")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    graft.operators.OperatorCaches.releaseAll()
    assert(out == Map(1L -> ((2L, 1)), 4L -> ((1L, 0))),
      s"got $out — order matters, adjacency matters")

    // repeated-term phrase: alignment must use each occurrence once
    val rep = Retrieval.phraseSearch(docs((7L, "go go go stop")), Seq("go", "go"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    graft.operators.OperatorCaches.releaseAll()
    assert(rep.toSeq == Seq((7L, 2L, 0)), s"'go go' occurs at 0 and 1: $rep")

    // 3-term phrase
    val tri = Retrieval.phraseSearch(d, Seq("scan", "table", "hash")).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    graft.operators.OperatorCaches.releaseAll()
    assert(tri == Map(1L -> 3), s"got $tri")
  }

  test("bigram surprisal: add-one model computed by hand on a toy corpus") {
    val d = docs((1L, "a b a b"), (2L, "a b"))
    // bigrams: d1 = (a,b),(b,a),(a,b); d2 = (a,b)
    // c12(a,b)=3, c12(b,a)=1; c1(a)=3, c1(b)=1; V=2
    val out = TextAnalysis.bigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def term(c1: Long, c12: Long) =
      math.rint(math.log((c1 + 2).toDouble / (c12 + 1).toDouble) * 1e6) / 1e6
    val tAB = term(3, 3) // ln(5/4)
    val tBA = term(1, 1) // ln(3/2)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (2 * tAB + tBA)) < 1e-9)
    assert(out(2L) == ((1L, tAB)))
    // context sensitivity: the unigram model cannot separate these
    // two docs' token bags per position — the bigram model scores
    // the rarer (b,a) continuation strictly higher
    assert(tBA > tAB)
  }

  test("hybrid RRF: fuses both legs, score is exactly the rank formula") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val d = graft.sources.Tables(spark, sf, "documents")
    val terms = Seq("spark", "join", "window")
    val out = Retrieval.hybridRrf(d, emb, terms, queryVecId = 0L, k = 10)
      .collect()
    // ranks are 1..k, unique, ordered by the fused score
    assert(out.map(_.getInt(4)).toSeq == (1 to out.length))
    // every fused row carries at least one leg rank, and the score is
    // exactly 1/(60+lex) + 1/(60+vec) with absent legs contributing 0
    out.foreach { r =>
      val lex = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val vec = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(lex.isDefined || vec.isDefined)
      val want = lex.map(x => 1.0 / (x + 60)).getOrElse(0.0) +
        vec.map(x => 1.0 / (x + 60)).getOrElse(0.0)
      assert(r.getDouble(1) == want)
    }
    // both legs contribute to the fused top-k on this corpus
    assert(out.exists(!_.isNullAt(2)) && out.exists(!_.isNullAt(3)))
    graft.operators.OperatorCaches.releaseAll()
  }
}
