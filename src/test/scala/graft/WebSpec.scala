package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Web

/** Web curation: boilerplate removal must recover exactly the
  * planted content (and kill each chrome block for the documented
  * reason), the URL rule ladder must classify and ORDER as specified,
  * and the whole family must stay row-local column algebra — no UDF,
  * no shuffle before the final roll-ups.
  */
class WebSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("extractMainText recovers the planted text of every document " +
       "and drops every chrome block") {
    val pages = Web.htmlFromDocs(docs)
    val got = Web.extractMainText(pages)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    val n = docs.count()
    assert(got.filter(col("main_text") === col("text")).count() == n,
      "some document's content was not recovered verbatim")
    // block accounting: kept = the content paragraphs only; dropped =
    // exactly the 5 chrome blocks (head/title, nav, sidebar, footer,
    // closing tags)
    assert(got.filter(col("n_blocks") - col("n_kept") =!= 5).count() == 0)
  }

  test("block scoring kills chrome for the documented reasons: " +
       "title under minLen, nav/sidebar/footer over link density") {
    val one = Web.htmlFromDocs(docs.filter(col("doc_id") === 7L))
      .select("html").as[String].head()
    val blocks = one.split("\n")
    def stripped(b: String) = b.replaceAll("<[^>]*>", "").trim
    def anchors(b: String) =
      "<a [^>]*>([^<]*)</a>".r.findAllMatchIn(b).map(_.group(1)).mkString
    val title = blocks.head
    assert(stripped(title).length < 15, "title must die on minLen")
    for (chrome <- Seq(blocks(1), blocks(blocks.length - 3),
        blocks(blocks.length - 2))) {
      val s = stripped(chrome)
      assert(3 * anchors(chrome).length > s.length,
        s"chrome block must die on link density: $chrome")
    }
    for (p <- blocks.filter(_.startsWith("<p>"))) {
      val s = stripped(p)
      assert(s.length >= 15 && anchors(p).isEmpty,
        s"content paragraph must survive both rules: $p")
    }
  }

  test("url verdict ladder: every rule fires, and in the documented " +
       "order (scheme > extension > tracking > depth)") {
    val links = Seq(
      (1L, "ftp://src0.example.com/file"),                // bad_scheme
      (2L, "https://a.example.com/img/x.jpg"),            // binary_ext
      (3L, "https://a.example.com/p?utm_source=x"),       // tracking
      (4L, "https://a.example.com/a/b/c/d/e/f"),          // too_deep
      (5L, "https://a.example.com/post/1"),               // keep
      // order pins: a deep .jpg is binary_ext (ext before depth), a
      // tracked deep path is tracking (tracking before depth)
      (6L, "https://a.example.com/a/b/c/d/e/f.jpg"),
      (7L, "https://a.example.com/a/b/c/d/e/f?utm_source=x"),
      // non-tracking query params survive to the depth check / keep
      (8L, "https://a.example.com/p?page=2"),
      // depth is the path only — query segments don't count
      (9L, "https://a.example.com/a/b?x=c/d/e/f/g")
    ).toDF("doc_id", "url")
    val got = Web.urlVerdicts(links).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "bad_scheme", 2L -> "binary_ext",
      3L -> "tracking", 4L -> "too_deep", 5L -> "keep",
      6L -> "binary_ext", 7L -> "tracking", 8L -> "keep", 9L -> "keep"))
  }

  test("plan shapes: extraction is one mapper (no exchange, no UDF); " +
       "the profile shuffles only for its final roll-up") {
    val extract = Web.extractMainText(Web.htmlFromDocs(docs))
    val ep = extract.queryExecution.executedPlan.toString
    // the page builder's Par.fan (r16) adds ONE round-robin exchange
    // to spread the single-file test scan; extraction itself must
    // still add no KEYED shuffle — data never moves by value
    assert(!ep.contains("Exchange hashpartitioning") &&
        !ep.contains("Exchange rangepartitioning"),
      s"row-local extraction must not shuffle by key:\n$ep")
    assert(!ep.contains("BatchEvalPython") && !ep.contains("ScalaUDF"),
      s"no UDFs in the web family:\n$ep")
    val profile = Web.urlFilterProfile(docs)
    val shuffles = profile.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange hashpartitioning"))
    // partial_count/partial_distinct + final — one logical roll-up,
    // at most two exchanges (countDistinct expands to two-phase)
    assert(shuffles <= 2, s"profile roll-up shuffles: $shuffles")
    // the link graph carries `source` through the explode — a
    // corpus-size join-back to recover it would show as a Join here
    val gp = Web.linkGraph(docs).queryExecution.executedPlan.toString
    assert(!gp.contains("Join"), s"link graph must not join:\n$gp")
  }
}
