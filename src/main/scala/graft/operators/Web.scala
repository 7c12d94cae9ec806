package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web curation — the front end of a web-scale training-data
  * pipeline: HTML boilerplate removal (jusText/trafilatura-style
  * block scoring), hyperlink extraction, URL quality filtering, and
  * the cross-site link graph. The reference pipeline ingests already-
  * clean records; a 100 TB corpus does not arrive clean, so these are
  * the operators that stand between a crawl and every
  * dedup/quality/mixing stage this engine already ships.
  *
  * Scale shape: every operator here is ROW-LOCAL column algebra
  * (regexp + array ops inside whole-stage codegen) — no UDF, no
  * shuffle until the final small aggregate. At 100 TB that is a
  * mapper-only scan; the only exchanges are the per-(domain, verdict)
  * and per-(source, domain) roll-ups, whose group counts are bounded
  * by |domains| · |verdicts|, fully map-side combinable.
  *
  * Cross-engine exactness: block scoring uses INTEGER cross-
  * multiplication (3·link_chars ≤ block_chars), never a float
  * density, so the DuckDB oracle replays keep/drop decisions
  * bit-for-bit.
  */
object Web {

  /** Deterministic synthetic HTML page per document — the fixture
    * generator (the web twin of `Multimodal.imagesFromIds`): the
    * document's text becomes the content paragraphs, wrapped in the
    * boilerplate a real page carries (head/title, nav, related-links
    * sidebar, footer). Every byte derives from (doc_id, source,
    * text), so the DuckDB oracle rebuilds the page bit-for-bit and
    * the extraction gate can assert PLANTED-CONTENT RECOVERY: the
    * kept blocks must re-join to exactly the original text.
    *
    * Content chunking: 10-word paragraphs, the LAST paragraph
    * absorbing the remainder (10–19 words) — so every paragraph is
    * ≥ 19 chars and clears the extractor's default minLen=15 even on
    * all-single-char words, while every boilerplate block lands
    * under it or over the link-density bar. (Fixture bound: doc_id
    * must stay under 12 digits or the title block crosses minLen.)
    *
    * The sidebar plants one URL per filter rule class — clean,
    * binary extension, tracking params, over-deep path — pointing at
    * OTHER sources' domains ((doc_id·3+r) mod 20), which is what
    * gives the link graph real cross-site edges.
    */
  def htmlFromDocs(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val n = size(words)
    val nFull = floor(n / lit(10)).cast("int") // corpus contract: n >= 10
    val paras = transform(sequence(lit(0), nFull - 1), i =>
      concat(lit("<p>"),
        array_join(slice(words, i * 10 + 1,
          when(i < nFull - 1, lit(10)).otherwise(n - (nFull - 1) * 10)), " "),
        lit("</p>")))
    def ownUrl(path: String): Column =
      concat(lit("https://"), col("source"), lit(".example.com"), lit(path))
    def navA(path: String, label: String): Column =
      concat(lit("<a href=\""), ownUrl(path), lit("\">" + label + "</a>"))
    val nav = concat(lit("<nav>"), navA("/", "Home"), lit(" "),
      navA("/tags", "Tags"), lit(" "), navA("/feed", "Feed"), lit("</nav>"))
    // the ⌊doc_id/20⌋ term decorrelates the target from doc_id mod 20
    // (= the doc's own source in the driver corpus), so each source
    // fans out to MANY domains and the link graph genuinely branches
    def relDomain(r: Int): Column =
      concat(lit("https://src"),
        pmod(col("doc_id") * 3 + floor(col("doc_id") / 20) + r, lit(20))
          .cast("long").cast("string"),
        lit(".example.com"))
    def relA(r: Int, path: Column): Column =
      concat(lit("<a href=\""), relDomain(r), path,
        lit(s"""">Related $r</a>"""))
    val idStr = col("doc_id").cast("string")
    val sidebar = concat(lit("<div>"),
      relA(1, concat(lit("/post/"),
        pmod(col("doc_id"), lit(100)).cast("string"))), lit(" "),
      relA(2, concat(lit("/img/"), idStr, lit(".jpg"))), lit(" "),
      relA(3, concat(lit("/post/"), idStr, lit("?utm_source=feed"))),
      lit(" "),
      relA(4, concat(lit("/a/b/c/d/e/"), idStr)),
      lit("</div>"))
    val footer = concat(lit("<footer>© "),
      navA("/about", "About"), lit(" "), navA("/privacy", "Privacy"),
      lit(" "), navA("/terms", "Terms"), lit("</footer>"))
    // Par.fan (r16): the docs scan is a single-file parquet (1-5
    // partitions) and EVERYTHING downstream of the page builder — the
    // block-scoring regexes, link extraction, the URL rule ladder —
    // is row-local, so without fanning the whole web-curation front
    // end ran in ~3 tasks (measured: q_html_extract 3 jobs / 3 tasks /
    // 1.3 s). No-op when scan parallelism already matches the session.
    graft.sources.Par.fan(docs).select(col("doc_id"), col("source"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title></head><body>\n"),
        nav, lit("\n"),
        array_join(paras, "\n"), lit("\n"),
        sidebar, lit("\n"),
        footer, lit("\n</body></html>")).as("html"))
  }

  /** Boilerplate removal by per-block scoring — the line-block
    * variant of the published jusText/trafilatura heuristic: split
    * the page into blocks, score each by VISIBLE length and LINK
    * density, keep only long low-link blocks, strip tags, re-join.
    * A block survives iff
    *
    *   len(stripped) ≥ minLen  AND  3 · len(anchor_text) ≤ len(stripped)
    *
    * (the ⅓ link-density bar as an exact integer cross-multiply).
    * Navigation, link farms, sidebars, and footers are mostly anchor
    * text and die on the second clause; titles and chrome fragments
    * die on the first; body paragraphs pass both. Entirely row-local
    * (split + two regexps + an array fold) — at 100 TB this is a
    * mapper inside one WholeStageCodegen span.
    */
  def extractMainText(pages: DataFrame, minLen: Int = 15): DataFrame = {
    val stripped = (b: Column) =>
      trim(regexp_replace(b, "<[^>]*>", ""))
    val anchorChars = (b: Column) =>
      length(array_join(
        regexp_extract_all(b, lit("<a [^>]*>([^<]*)</a>"), lit(1)), ""))
    val blocks = split(col("html"), "\n")
    // strip ONCE per block (r16): the filter used `stripped(b)` twice
    // and the projection a third time — three tag-strip regex passes
    // per block on what is the pipeline's per-row hot path at corpus
    // scale. Materialize (stripped, anchor_chars) per block in one
    // transform, then filter/join on the precomputed fields — same
    // regexes on the same operands, so kept blocks and main_text are
    // byte-identical.
    val scored = transform(blocks, b =>
      struct(stripped(b).as("s"), anchorChars(b).as("ac")))
    val kept = filter(scored, e =>
      length(e("s")) >= minLen && e("ac") * 3 <= length(e("s")))
    pages.select(col("doc_id"),
      size(blocks).as("n_blocks"),
      size(kept).as("n_kept"),
      array_join(transform(kept, e => e("s")), " ").as("main_text"))
  }

  /** One row per hyperlink: (doc_id, url) via a single
    * regexp_extract_all + explode — the crawl frontier / link-graph
    * feed. Row-local explode; output is O(links), never joined back
    * wide.
    */
  def extractLinks(pages: DataFrame): DataFrame =
    pages.select(col("doc_id"),
      explode(regexp_extract_all(col("html"),
          lit("href=\"([^\"]*)\""), lit(1)))
        .as("url"))

  /** URL quality verdicts — the rule ladder every crawl pipeline
    * runs before fetching/keeping a link, as one row-local CASE
    * chain (first matching rule wins):
    *
    *   bad_scheme    not http(s)
    *   binary_ext    path ends in a non-text asset extension
    *   tracking      query string carries utm_ / fbclid / sessionid
    *   too_deep      more than `maxDepth` path segments
    *   keep          none of the above
    *
    * Parsing is three anchored regexps (domain, path, query) — no
    * URL library, no UDF, identical in the oracle's RE2.
    */
  def urlVerdicts(links: DataFrame, maxDepth: Int = 4): DataFrame = {
    val domain = regexp_extract(col("url"), "^https?://([^/?#]+)", 1)
    val path = regexp_extract(col("url"), "^https?://[^/?#]+(/[^?#]*)", 1)
    val query = regexp_extract(col("url"), "\\?([^#]*)", 1)
    val depth = size(split(path, "/")) - 1
    val verdict =
      when(!col("url").rlike("^https?://"), "bad_scheme")
        .when(path.rlike("\\.(jpe?g|png|gif|css|js|ico|svg|woff2?)$"),
          "binary_ext")
        .when(query.rlike("(^|&)(utm_[a-z]+|fbclid|sessionid)="), "tracking")
        .when(depth > maxDepth, "too_deep")
        .otherwise("keep")
    // input columns pass through, so callers can carry page-level
    // context (e.g. the source) without a corpus-size join-back
    links.withColumn("domain", domain).withColumn("verdict", verdict)
  }

  /** Per-(domain, verdict) URL-filter profile over a page corpus —
    * the crawl-policy dashboard: how much of each site's outlink mass
    * each rule removes. Group count ≤ |domains| · 5, map-side
    * combinable.
    */
  def urlFilterProfile(docs: DataFrame, maxDepth: Int = 4): DataFrame =
    urlVerdicts(extractLinks(htmlFromDocs(docs)), maxDepth)
      .groupBy("domain", "verdict")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))

  /** Cross-site link graph: (source, target domain, n_links) edges
    * from each document's KEPT outlinks (post-filter — the graph a
    * crawler would actually follow). Self-loops (a source linking its
    * own domain: nav/footer chrome) are excluded so the edges are the
    * discovery structure, not the chrome.
    */
  def linkGraph(docs: DataFrame, maxDepth: Int = 4): DataFrame = {
    // source rides the explode from the page row itself — carrying an
    // 8-byte column beats a corpus-size join-back to recover it
    val pages = htmlFromDocs(docs)
    val links = pages.select(col("doc_id"), col("source"),
      explode(regexp_extract_all(col("html"),
        lit("href=\"([^\"]*)\""), lit(1))).as("url"))
    urlVerdicts(links, maxDepth)
      .filter(col("verdict") === "keep")
      .filter(col("domain") =!=
        concat(col("source"), lit(".example.com")))
      .groupBy(col("source"), col("domain"))
      .agg(count(lit(1)).as("n_links"))
  }
}
