package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Large-scale document deduplication — the LLM-training-data
  * operators layered on the engine (builder brief; not present in the
  * reference, which has no document pipeline).
  *
  * All hashing is md5-based so the DuckDB oracle can reproduce results
  * exactly: md5 hex strings are lexicographically comparable in both
  * engines, which gives deterministic MinHash (min over strings) and
  * SimHash (bit = high bit of a hex digit) without any
  * engine-specific hash function.
  *
  * Scale design: every stage is shuffle-by-key (shingle, band, byte
  * bucket) with no global collect; candidate generation is always
  * through an equi-join on a derived key so Catalyst plans plain
  * hash joins. Ultra-frequent shingles are dropped by a document-
  * frequency cap before the pair join — the classic skew guard that
  * keeps the shingle join from quadratic blowup on boilerplate text.
  */
object Dedup {

  /** Per-call audit sink for [[connectedComponents]]: receives the
    * number of driver-coordinated rounds the call took (seed round
    * excluded). A caller-owned sink, not a global, so concurrent
    * calls (parallel test suites in one JVM) cannot clobber each
    * other's counts. Pointer jumping makes the count O(log diameter);
    * DedupSpec pins the bound on worst-case chain shapes so a
    * regression to hop-only propagation (linear rounds) fails a
    * test, not a 100-TB job.
    */
  final class CcAudit { @volatile var rounds: Int = -1 }

  /** Exact dedup: hash-groupBy on the full text. Output one row per
    * distinct text with its multiplicity and the id to keep.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))

  /** (doc_id, sh) distinct word n-grams per document — the shared
    * explode used by the shingle family and [[decontaminate]].
    * Tokenizes ONCE per row: element_at over a column reference
    * instead of element_at(split(...)) — the naive form re-splits the
    * text per shingle term (~n·|shingles| splits per document).
    */
  private[graft] def ngrams(docs: DataFrame, n: Int): DataFrame = {
    val toked = graft.sources.Par.fan(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = when(size(col("toks")) >= n,
      expr(s"""transform(sequence(1, size(toks) - ${n - 1}),
              |  i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(toks, i + $j)").mkString(", ")}))"""
        .stripMargin)).otherwise(array().cast("array<string>"))
    toked.select(col("doc_id"), explode(array_distinct(grams)).as("sh"))
  }

  /** (doc_id, shingle) pairs: distinct word n-grams (default n=3),
    * with shingles above the document-frequency cap removed.
    */
  def shingles(docs: DataFrame, n: Int = 3, maxDocFreq: Long = 1000): DataFrame = {
    val ex = ngrams(docs, n)
    val freq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    ex.join(freq, "sh").select("doc_id", "sh")
  }

  /** Benchmark decontamination — the GPT-3/PaLM-style n-gram overlap
    * screen: a training document is CONTAMINATED when any of its word
    * n-grams also appears in the held-out evaluation set. `evalPred`
    * names the eval rows; every non-eval document comes back with its
    * count of distinct shared n-grams and the contamination flag.
    *
    * Scale shape: the eval side of the join is a benchmark suite —
    * megabytes against the corpus's terabytes — so its distinct
    * n-gram set BROADCASTS and the corpus side never shuffles at
    * all until the (matches-only, tiny) per-doc count; the final
    * flag join is keyed on doc_id. No corpus self-join anywhere.
    * The published screens use 8–13-gram windows on tokenized text;
    * n=5 matches this corpus's 8–90-word documents.
    */
  def decontaminate(docs: DataFrame, evalPred: Column, n: Int = 5): DataFrame =
    decontaminateAgainst(docs.filter(!evalPred),
      evalGramSet(docs.filter(evalPred), n), n)

  /** Distinct n-gram hash set of an eval corpus — built once,
    * broadcast at every probe. This is the STANDING state of the
    * streaming decontamination gate
    * ([[graft.streaming.CurationLoop.admissions]]): eval benchmarks
    * change rarely; ingest batches probe the frozen set.
    */
  def evalGramSet(evalDocs: DataFrame, n: Int = 5): DataFrame =
    ngrams(evalDocs, n).select(col("sh")).distinct()

  /** Decontamination probe against a PREBUILT eval gram set — the
    * batch operator's core, shared with the streaming admission gate:
    * the probed side never self-joins, the gram set broadcasts, cost
    * is O(|docs| grams).
    */
  def decontaminateAgainst(docs: DataFrame, evalGrams: DataFrame,
                           n: Int = 5): DataFrame = {
    val hits = ngrams(docs, n)
      .join(broadcast(evalGrams), "sh")
      // grams are distinct per doc, so COUNT = distinct shared grams
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-prefiltered decontamination — the form of
    * [[decontaminate]] that survives an eval set TOO BIG TO
    * BROADCAST as an exact hash table. A Bloom filter of the eval
    * n-grams (built once with Spark's sketch aggregate, ~10 bits per
    * gram at 1% fpp vs ~100+ bytes per materialized gram string) is
    * broadcast instead; corpus grams stream through the filter
    * row-locally, and only the survivors — true hits plus the fpp
    * sliver — reach an exact verification join. That verify join is
    * a plain SHUFFLE join on the gram key, NOT a broadcast: the
    * probe side has already collapsed from |corpus|·|grams/doc| to
    * ≈|true hits|·(1+fpp), so both join inputs are small no matter
    * how large the eval suite grows.
    *
    * The output is BIT-IDENTICAL to [[decontaminate]] (same oracle):
    * the Bloom filter only ever adds false POSITIVES, and every
    * survivor is re-checked exactly, so no hit is lost and no
    * non-hit survives. DedupSpec pins the equality.
    *
    * Scale shape at 100 TB: the filter is sized from a driver-side
    * count of the (benchmark-suite-sized) eval grams — one tiny job;
    * the corpus side stays a single scan with a row-local filter and
    * shuffles only matched grams. The probe is Spark's NATIVE
    * `BloomFilterMightContain` expression (the codegen'd kernel the
    * engine's own runtime row-filters use) over `xxhash64(gram)` —
    * the r13-carried ScalaUDF is gone: the sketch is built over the
    * same xxhash64 longs, serialized once, and embedded as a binary
    * literal the expression deserializes once per task. The literal
    * rides the plan exactly like the broadcast it replaces (same
    * ~10-bits-per-gram payload, same eval-set-must-be-sketchable
    * contract).
    */
  def decontaminateBloom(docs: DataFrame, evalPred: Column, n: Int = 5,
                         fpp: Double = 0.01): DataFrame = {
    // cached: sized (count), sketched (bloomFilter), and verify-joined
    val evalGrams = OperatorCaches.track(evalGramSet(docs.filter(evalPred), n))
    val expected = math.max(evalGrams.count(), 64L)
    // build over xxhash64 LONGS: BloomFilterMightContain probes with
    // mightContainLong, so the sketch must be long-keyed (putLong and
    // mightContainLong share the sketch's internal hash)
    val bloom = evalGrams.select(xxhash64(col("sh")).as("h"))
      .stat.bloomFilter("h", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probe = org.apache.spark.sql.graftshim.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bos.toByteArray,
            org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graftshim.ColumnBridge
          .expression(xxhash64(col("sh")))))
    val train = docs.filter(!evalPred)
    val hits = ngrams(train, n)
      .filter(probe)
      .join(evalGrams, "sh") // exact verify: shuffle join, survivors only
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Contamination-span REMOVAL — the transform [[decontaminate]]
    * only flags: every training document is cut into NON-overlapping
    * `blockTokens`-token blocks (full blocks only; the short tail is
    * always kept, exactly the [[substringScrub]] framing), a block is
    * dropped when ANY of its word `n`-grams appears in the held-out
    * eval set, and the document is REBUILT from the surviving blocks
    * in original order. This is the published eval-decontamination
    * *scrub* (remove the overlapping span, keep the document) as
    * opposed to the screen (drop the document) — the form a pipeline
    * wants when contamination is a quote inside an otherwise-clean
    * page. Grams straddling a block boundary are not probed — the
    * fixed-span trade every block-level scrubber makes; tighten with
    * a smaller `blockTokens` if the boundary sliver matters.
    *
    * Scale shape: the eval gram set builds once and BROADCASTS to a
    * row-local probe of the block grams (no shuffle on the corpus
    * side until the per-doc rebuild); the rebuild is one doc_id-keyed
    * aggregate whose partition is bounded by a single document's
    * block count — the [[substringScrub]] envelope with the corpus-
    * frequency join replaced by a broadcast membership probe.
    */
  def decontaminateScrub(docs: DataFrame, evalPred: Column, n: Int = 5,
                         blockTokens: Int = 10): DataFrame = {
    require(blockTokens >= n,
      s"blockTokens ($blockTokens) must be >= n ($n): a shorter block " +
        "holds no complete n-gram and could never test contaminated")
    val evalGrams = evalGramSet(docs.filter(evalPred), n)
    val toked = graft.sources.Par.fan(docs.filter(!evalPred))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("nTok", size(col("toks")))
      .withColumn("nb", (col("nTok") / blockTokens).cast("int"))
    val cached = OperatorCaches.track(toked)
    // nb = 0 guard: sequence(1, 0) runs DESCENDING in Spark
    val blocks = OperatorCaches.track(cached
      .select(col("doc_id"),
        posexplode(expr(s"""CASE WHEN nb >= 1 THEN
          |  transform(sequence(1, nb),
          |    b -> slice(toks, (b - 1) * $blockTokens + 1, $blockTokens))
          |  ELSE CAST(array() AS array<array<string>>) END""".stripMargin)))
      .select(col("doc_id"), col("pos").as("idx"),
        concat_ws(" ", col("col")).as("block"), col("col").as("btoks")))
    // blocks are exactly blockTokens long, so the gram index range is
    // static; distinct before the probe — membership needs each gram
    // once per block
    val hit = blocks
      .select(col("doc_id"), col("idx"),
        explode(array_distinct(expr(
          s"""transform(sequence(1, ${blockTokens - n + 1}),
             |  i -> concat_ws(' ', slice(btoks, i, $n)))""".stripMargin)))
          .as("sh"))
      .join(broadcast(evalGrams), "sh")
      .select("doc_id", "idx").distinct()
    val flagged = OperatorCaches.track(
      blocks.join(hit.withColumn("bad", lit(true)),
        Seq("doc_id", "idx"), "left"))
    val kept = flagged.filter(col("bad").isNull)
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("idx"), col("block")))),
          s => s("block"))).as("kept_text"))
    val dropped = flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_dropped"))
    cached
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("nb") * blockTokens + 1,
          greatest(col("nTok") - col("nb") * blockTokens, lit(0))))
          .as("tail_text"))
      .join(kept, Seq("doc_id"), "left")
      .join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(" ", filter(array(col("kept_text"), col("tail_text")),
          x => x.isNotNull && x =!= "")).as("clean_text"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** N-gram Jaccard near-dup pairs: self-join distinct shingle sets,
    * |A∩B| / |A∪B| ≥ threshold. Integer-ratio division so the double
    * is bit-identical across engines.
    *
    * This is the FULL-RECALL form: the shingle self-join examines every
    * co-shingled pair, so its cost is the total candidate volume —
    * use [[jaccardPairsBanded]] as the scale path.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double, n: Int = 3,
                   maxDocFreq: Long = 1000): DataFrame = {
    val sh = OperatorCaches.track(shingles(docs, n, maxDocFreq))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    jaccardFromIntersections(inter, sh, threshold)
  }

  /** Banded Jaccard — the scale path: candidate pairs come from the
    * MinHash-LSH band join (cheap, selective), and the exact shingle
    * intersection is counted ONLY for those candidates, so the shingle
    * join volume is Σ_candidates |shingles(doc_a)| instead of the full
    * co-shingled pair volume. Recall is the LSH band recall (full on
    * corpora whose near-dup pairs are true high-Jaccard dupes — every
    * ≥0.5 pair at sf0.01/0.1 is recovered); the oracle mirrors the
    * banding, so the output is engine-identical by construction.
    */
  def jaccardPairsBanded(docs: DataFrame, threshold: Double, n: Int = 3,
                         maxDocFreq: Long = 1000, numHashes: Int = 8,
                         bands: Int = 2): DataFrame = {
    val sh = OperatorCaches.track(shingles(docs, n, maxDocFreq))
    // cached: the banded signature view is consumed 4× inside bandPairs
    val cand = bandPairs(OperatorCaches.track(signaturesFrom(sh, numHashes)),
      numHashes, bands)
    val inter = cand
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    jaccardFromIntersections(inter, sh, threshold)
  }

  /** Shared tail: intersection counts + per-doc set sizes → thresholded
    * integer-ratio Jaccard.
    */
  private def jaccardFromIntersections(inter: DataFrame, sh: DataFrame,
                                       threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nsh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nsh", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** N-gram CONTAINMENT pairs — the asymmetric near-dup detector:
    * containment(A→B) = |A∩B| / |A| is ≈1 when A is embedded inside a
    * larger B even though their Jaccard is low (the quote/boilerplate/
    * sub-document case Broder's resemblance-vs-containment distinction
    * exists for).
    *
    * Candidates come from a PREFIX-FILTERED shingle equi-join, NOT the
    * MinHash bands: resemblance-LSH candidate probability scales with
    * Jaccard, and a small document inside a large one has Jaccard ≈
    * |A|/|B| → the very pairs this operator exists for would be the
    * ones the bands miss (DocOpsSpec pins a concrete case).
    *
    * Prefix filter (PPJoin-style, adapted to the capped-numerator /
    * uncapped-denominator ratio): if cont(A→B) = |A∩B|/|A|_full ≥ t,
    * then the capped intersection is ≥ ⌊t·na⌋, so B can miss at most
    * msh_A − ⌊t·na⌋ of A's capped shingles — it MUST share one of any
    * (msh_A − ⌊t·na⌋ + 1)-subset. We join only each doc's
    * (msh − ⌊t·na⌋ + 1) RAREST shingles (global df order, ties by
    * value — rarest-first maximizes selectivity; losslessness holds
    * for any subset of that size) against full capped shingle sets,
    * in both directions, so join volume is Σ_sh df_prefix·df instead
    * of Σ_sh df² — and the df ≤ maxDocFreq cap still bounds the
    * per-shingle worst case. The exact intersection is then counted
    * only on candidate pairs. Output is provably identical to the
    * direct self-join (DocOpsSpec pins equivalence).
    *
    * The df cap applies ONLY to candidates and the intersection count
    * (which it can only shrink — capped |A∩B| underestimates); the
    * |A| and |B| denominators are the FULL n-gram set sizes, so a
    * document dominated by dropped high-df shingles cannot spuriously
    * clear the threshold through a shrunken denominator. Pair kept
    * when EITHER direction clears the threshold; integer-ratio
    * divisions, engine-identical.
    *
    * `audit`: optional [[Observation]] receiving `n_candidates`
    * (distinct pairs entering the exact count) and `n_join_rows`
    * (pre-dedup prefix-join volume) — the 100-TB safety gauge the
    * round-5 verdict asked for; retrieve with `obs.get` after the
    * first action.
    *
    * `prefixFilter`: Some(true/false) forces the prefix-filtered or
    * direct form; None (default) auto-selects by corpus size against
    * [[ContainmentPrefixMinDocs]] — the prefix prelude is measured
    * overhead on small corpora while its candidate reduction is what
    * keeps the join volume bounded on large ones. The size comes from
    * `sizeHint` when the caller knows it, else from the logical
    * plan's statistics ([[estimatedDocs]]) — never from an eager
    * count (PlanSpec asserts constructing the operator launches no
    * job). Both forms produce identical output (DocOpsSpec pins it).
    */
  /** Corpus size (docs) above which [[containmentPairs]] switches
    * from the direct df-capped shingle self-join to the
    * prefix-filtered form. The prefix prelude is three extra keyed
    * passes over the shingle frame (df counts, a per-doc rank window,
    * the prefix joins) — pure constant-factor overhead whose payoff,
    * a candidate-join volume of Σ df_prefix·df instead of Σ df²,
    * grows with corpus size while the prelude stays linear. Measured
    * at sf0.1 (5k docs) the prelude dominates (see COVERAGE.md), so
    * small corpora take the direct path; output is identical either
    * way (DocOpsSpec pins equivalence).
    */
  val ContainmentPrefixMinDocs: Long = 100000L

  /** Planning-time corpus-size estimate with NO Spark action: the
    * optimized plan's row-count statistic when the source carries one,
    * else its size-in-bytes over a conservative ~100 bytes/document.
    * Misestimation only flips WHICH of two output-identical join
    * forms [[containmentPairs]] runs (DocOpsSpec pins the
    * equivalence), so an estimate is safe where the previous eager
    * docs.count() was a full upstream pass executed as a side effect
    * of *planning* — and an UNKNOWN size (leaf-default Long.MaxValue
    * sizeInBytes) deliberately lands on the prefix path, the form
    * that is robust at scale.
    */
  private def estimatedDocs(docs: DataFrame): Long = {
    val st = docs.queryExecution.optimizedPlan.stats
    st.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse {
      val est = st.sizeInBytes / 100
      if (est >= BigInt(Long.MaxValue)) Long.MaxValue else est.toLong
    }
  }

  def containmentPairs(docs: DataFrame, threshold: Double, n: Int = 3,
                       maxDocFreq: Long = 1000,
                       audit: Option[Observation] = None,
                       prefixFilter: Option[Boolean] = None,
                       sizeHint: Option[Long] = None): DataFrame = {
    val sh = OperatorCaches.track(shingles(docs, n, maxDocFreq))
    // sizes over the UNCAPPED n-gram sets (the ratio's contract)
    val sizes = ngrams(docs, n).groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    // plan choice runs NO job: explicit override > caller-known row
    // count > plan-statistics estimate (never an eager count — an
    // operator must not execute its input as a planning side effect)
    val usePrefix = prefixFilter.getOrElse(
      sizeHint.getOrElse(estimatedDocs(docs)) >= ContainmentPrefixMinDocs)
    val inter = if (usePrefix) {
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      val ranked = sh.join(dfreq, "sh")
        .withColumn("rnk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
      val plen = sh.groupBy("doc_id").agg(count(lit(1)).as("msh"))
        .join(sizes, "doc_id")
        .select(col("doc_id"),
          (col("msh") - floor(lit(threshold) * col("nsh")) + 1).as("plen"))
      val prefix = ranked.join(plen, "doc_id")
        .filter(col("rnk") <= col("plen")).select("doc_id", "sh")
      val candGrouped = prefix.as("p").join(sh.as("f"),
          col("p.sh") === col("f.sh") && col("p.doc_id") =!= col("f.doc_id"))
        .groupBy(least(col("p.doc_id"), col("f.doc_id")).as("doc_a"),
          greatest(col("p.doc_id"), col("f.doc_id")).as("doc_b"))
        .agg(count(lit(1)).as("n_hits"))
      val cand = audit.fold(candGrouped)(o => candGrouped.observe(o,
          count(lit(1)).as("n_candidates"), sum("n_hits").as("n_join_rows")))
        .select("doc_a", "doc_b")
      cand
        .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
        .join(sh.as("b"),
          col("doc_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    } else {
      // direct form: the self-join IS the intersection count — no
      // separate candidate stage, so the shingle frame is joined once
      val grouped = sh.as("p").join(sh.as("f"),
          col("p.sh") === col("f.sh") && col("p.doc_id") < col("f.doc_id"))
        .groupBy(col("p.doc_id").as("doc_a"), col("f.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      audit.fold(grouped)(o => grouped.observe(o,
        count(lit(1)).as("n_candidates"), sum("inter").as("n_join_rows")))
    }
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nsh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nsh", "nb"), "doc_b")
      .withColumn("cont_ab", col("inter").cast(DoubleType) / col("na"))
      .withColumn("cont_ba", col("inter").cast(DoubleType) / col("nb"))
      .filter(col("cont_ab") >= threshold || col("cont_ba") >= threshold)
      .select("doc_a", "doc_b", "cont_ab", "cont_ba")
  }

  /** MinHash signatures: h_j(doc) = min over shingles of md5("j:"+sh).
    * One aggregation pass computes all hashes (no per-hash shuffle).
    * `n` is the shingle width — threaded, not hardcoded, so an index
    * built here and a probe side built elsewhere (e.g. the streaming
    * twin's row-local keys) must AGREE on it explicitly instead of
    * silently probing k-gram keys against a 3-gram index.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 8,
                        maxDocFreq: Long = 1000, n: Int = 3): DataFrame =
    signaturesFrom(shingles(docs, n, maxDocFreq), numHashes)

  /** Signature aggregation over an existing (doc_id, sh) frame — lets
    * callers that already materialized shingles (e.g. the banded
    * Jaccard) reuse them instead of re-shingling.
    */
  private def signaturesFrom(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j:"), col("sh")))).as(s"h$j"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** CORPUS-level MinHash similarity — sketch algebra over sources:
    * one `numHashes`-slot MinHash signature per SOURCE (min over the
    * source's whole gram multiset — the min over a union is the min
    * of mins, so per-source signatures compose by plain aggregation),
    * then the estimated Jaccard between every source pair is the
    * fraction of matching slots. The corpus-similarity dashboard a
    * mixture designer reads before setting sampling weights —
    * [[sourceOverlap]] counts individual near-dup PAIRS; this
    * estimates whole-distribution overlap from #sources·numHashes
    * longs of state.
    *
    * Scale shape: ONE pass over the gram explode into a map-side-
    * combinable min aggregate with #sources groups; the pair join is
    * #sources × #sources rows of signature — driver-trivial at any
    * corpus size (the deliberate tiny cross join is over a handful
    * of signature rows, never data).
    *
    * Edge: a source with no document of ≥ n tokens contributes no
    * grams, gets no signature row, and is ABSENT from the matrix
    * (there is nothing to sketch) — the oracle mirrors this by
    * construction.
    */
  def sourceMinhashSim(docs: DataFrame, n: Int = 3,
                       numHashes: Int = 8): DataFrame = {
    val g = graft.sources.Par.fan(docs)
      .select(col("source"), split(col("text"), " ").as("toks"))
      .select(col("source"), explode(when(size(col("toks")) >= n,
        expr(s"""transform(sequence(1, size(toks) - ${n - 1}),
                |  i -> concat_ws(' ', slice(toks, i, $n)))""".stripMargin))
        .otherwise(array().cast("array<string>"))).as("sh"))
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j:"), col("sh")))).as(s"h$j"))
    val sigs = g.groupBy("source").agg(aggs.head, aggs.tail: _*)
    val a = sigs.select(col("source").as("src_a") +:
      (0 until numHashes).map(j => col(s"h$j").as(s"a$j")): _*)
    val b = sigs.select(col("source").as("src_b") +:
      (0 until numHashes).map(j => col(s"h$j").as(s"b$j")): _*)
    val matches = (0 until numHashes)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), matches.as("n_match"),
        (matches.cast(DoubleType) / lit(numHashes.toDouble))
          .as("est_jaccard"))
  }

  /** (doc_id, band, bkey) LSH band keys from a signature frame
    * (h0..h{n-1} columns) — the probe structure shared by the pair
    * self-join and the incremental (batch-vs-corpus) semi-join.
    */
  private[graft] def bandKeys(sigs: DataFrame, numHashes: Int,
                              bands: Int): DataFrame = {
    val rows = numHashes / bands
    (0 until bands).map { b =>
      val key = md5(concat_ws("|",
        (0 until rows).map(r => col(s"h${b * rows + r}")): _*))
      sigs.select(col("doc_id"), lit(b).as("band"), key.as("bkey"))
    }.reduce(_ unionAll _)
  }

  /** Band a signature frame and self-join on the band buckets —
    * shared by both MinHash variants.
    */
  private def bandPairs(sigs: DataFrame, numHashes: Int,
                        bands: Int): DataFrame = {
    val banded = bandKeys(sigs, numHashes, bands)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs: band the signature (rows-per-band
    * hashes concatenated), join docs sharing any band bucket.
    */
  def minhashCandidates(docs: DataFrame, numHashes: Int = 8,
                        bands: Int = 2): DataFrame =
    // cached: the banded view is consumed 4× (2 bands × 2 join sides)
    bandPairs(OperatorCaches.track(minhashSignatures(docs, numHashes)),
      numHashes, bands)

  /** Hex nibble → 0-15 as a when-chain (kept as an expression both
    * engines can mirror exactly; no hex→int builtin is shared).
    */
  private[operators] def hexNibble(c: Column): Column =
    "0123456789abcdef".zipWithIndex.tail.foldLeft(when(c === "0", 0)) {
      case (acc, (ch, i)) => acc.when(c === ch.toString, i)
    }

  /** One-permutation MinHash (Li et al., NIPS 2012): ONE md5 per
    * shingle — the hash space is split into `numHashes` buckets by the
    * digest's first nibble and the per-bucket minima form the
    * signature. An eighth of the hash compute of the classic k-hash
    * form at comparable LSH quality (locally the dedup is
    * shuffle-bound, ~6% faster; the hash saving matters when CPU on
    * the token stream dominates, i.e. wide-corpus scans). A document too small to fill every bucket
    * leaves nulls, which concat_ws drops from the band key identically
    * in both engines (the documented OPH empty-bin caveat — dense
    * docs, like these, never hit it).
    */
  def minhashSignaturesOph(docs: DataFrame, numHashes: Int = 8,
                           maxDocFreq: Long = 1000, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n, maxDocFreq)
    val withHash = sh.select(col("doc_id"), md5(col("sh")).as("h"))
      .withColumn("b", pmod(hexNibble(substring(col("h"), 1, 1)),
        lit(numHashes)))
    val aggs = (0 until numHashes).map(j =>
      min(when(col("b") === j, col("h"))).as(s"h$j"))
    withHash.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** OPH-signature LSH candidates — same banding as
    * [[minhashCandidates]], an eighth of the hashing.
    */
  def minhashCandidatesOph(docs: DataFrame, numHashes: Int = 8,
                           bands: Int = 2): DataFrame =
    bandPairs(OperatorCaches.track(minhashSignaturesOph(docs, numHashes)),
      numHashes, bands)

  /** Blocked fuzzy matching: Levenshtein edit distance within a
    * blocking-key partition (the classic scalable fuzzy-dedup shape:
    * the O(n²) distance only runs inside blocks, never globally).
    */
  def fuzzyPairs(df: DataFrame, text: String, blocks: Seq[String],
                 id: String, maxDist: Int): DataFrame = {
    // composite blocking key: pair volume scales with the SQUARE of
    // block size, so multi-attribute blocking (brand alone: 8M pairs
    // at sf0.1, 15s; brand+size: ~160k pairs, sub-second) is the lever
    // that keeps edit-distance matching tractable — coupled with the
    // thresholded levenshtein (banded DP, −1 past the threshold) and
    // the |len(a)−len(b)| ≤ d necessary condition.
    val blk = concat_ws("", blocks.map(col): _*)
    val a = df.select(col(id).as("id_a"), blk.as("blk"), col(text).as("t_a"))
    val b = df.select(col(id).as("id_b"), blk.as("blk2"), col(text).as("t_b"))
    a.join(b, col("blk") === col("blk2") && col("id_a") < col("id_b") &&
        abs(length(col("t_a")) - length(col("t_b"))) <= maxDist)
      .withColumn("dist",
        graft.plans.BoundedLevenshtein(col("t_a"), col("t_b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Fellegi–Sunter-style record linkage: blocked candidate pairs
    * scored by weighted multi-field agreement — the entity-resolution
    * operator a data platform runs to link dirty copies of the same
    * real-world entity across sources (the probabilistic upgrade over
    * [[fuzzyPairs]]' single-field edit distance).
    *
    * Candidates come from an equi-join on the composite blocking key
    * (never all-pairs — block design bounds pair volume, the standard
    * linkage scale answer); each field contributes an integer
    * agreement/disagreement weight (the log-likelihood-ratio shape of
    * the FS model with fixed weights, so the score is exact and
    * engine-independent); pairs below `minScore` die in the join
    * output before anything shuffles again. Output: the scored pair
    * with per-field evidence and a match/possible classification at
    * the classic two-threshold decision.
    */
  def recordLinkage(records: DataFrame, id: String, name: String,
                    numeric: String, blocks: Seq[String],
                    nameMaxDist: Int = 2, numTol: Double = 1.0,
                    minScore: Int = 3, matchScore: Int = 6): DataFrame = {
    // blocking join on the block COLUMNS themselves (null-rejecting
    // SQL equality, no composite-key concat whose boundary or
    // null-skipping semantics could diverge from the oracle's
    // per-column equi-join). Fan the PROBE side: the per-pair scoring
    // (levenshtein over |block|² candidates) runs on the stream side
    // of the broadcast join, and a single-file scan would execute it
    // in ONE task (measured 5.6 s single-task at sf0.1; fanned it
    // parallelizes).
    val a = graft.sources.Par.fan(records).select(
      (col(id).as("id_a") +: col(name).as("n_a") +: col(numeric).as("v_a") +:
        blocks.map(bc => col(bc).as(s"a_$bc"))): _*)
    val b = records.select(
      (col(id).as("id_b") +: col(name).as("n_b") +: col(numeric).as("v_b") +:
        blocks.map(bc => col(bc).as(s"b_$bc"))): _*)
    val blockEq = blocks.map(bc => col(s"a_$bc") === col(s"b_$bc"))
      .reduce(_ && _)
    val nameScore = when(
      abs(length(col("n_a")) - length(col("n_b"))) <= nameMaxDist &&
        graft.plans.BoundedLevenshtein(col("n_a"), col("n_b"),
          nameMaxDist) >= 0,
      lit(4)).otherwise(lit(-2))
    val numScore = when(abs(col("v_a") - col("v_b")) <= numTol, lit(2))
      .otherwise(lit(-1))
    a.join(b, blockEq && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        nameScore.as("name_score"), numScore.as("num_score"))
      .withColumn("score", col("name_score") + col("num_score"))
      .filter(col("score") >= minScore)
      .withColumn("verdict",
        when(col("score") >= matchScore, "match").otherwise("possible"))
  }

  /** Deterministic dirty-copy feed for the linkage oracle: every 20th
    * record re-enters from a "second source" with a shifted key, one
    * trailing name typo, and a small balance drift — the classic
    * cross-source duplicate the linker must find.
    */
  def customerDirtyCopies(customer: DataFrame): DataFrame =
    customer.unionByName(
      customer.filter(col("c_custkey") % 20 === 0)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
        .withColumn("c_name",
          concat(col("c_name").substr(lit(1), length(col("c_name")) - 1),
            lit("x")))
        .withColumn("c_acctbal", col("c_acctbal") + 0.25))

  val SimhashBits = 32

  /** 32-bit SimHash. Token hash bits come from md5 hex digits: bit j
    * of a token = 1 iff hex digit j of md5(token) is in [8,f] (its
    * high bit) — reproducible in any engine with md5 + substr (md5
    * has exactly 32 hex digits). Weighted by token multiplicity
    * (explode without distinct).
    */
  def simhash(docs: DataFrame): DataFrame = {
    // per-token 32-bit mask in ONE native pass over the digest
    // (graft.plans.HexHighBits) — bit j is the high bit of hex digit
    // j, i.e. digit >= '8'; previously 32 separate substring
    // comparisons per token, each allocating a 1-char UTF8String
    val tok = graft.sources.Par.fan(docs).select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .withColumn("m",
        graft.plans.HexHighBits(md5(col("tok")), SimhashBits))
    // signed per-bit sums from the mask: ((m>>j)&1)*2-1 ∈ {-1, +1} —
    // the identical classification, so signatures are unchanged
    val bitSums = (0 until SimhashBits).map { j =>
      sum(shiftright(col("m"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$j")
    }
    val sig = (0 until SimhashBits).map(j =>
      when(col(s"s$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _)
    tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs at scale: LSH on the four bytes of the
    * 32-bit signature. With 4 blocks and hamming ≤ 3, the pigeonhole
    * principle guarantees at least one block matches exactly — FULL
    * recall at block-join cost, then candidates verified by
    * bit_count(xor) ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    sigBlockPairs(OperatorCaches.track(simhash(docs)), maxHamming)

  /** Byte-block LSH pair search over an (doc_id, simhash) frame — the
    * core of [[simhashPairs]], reusable on CONTRACTED inputs (one row
    * per distinct signature) where the id is the group representative.
    */
  private def sigBlockPairs(sig: DataFrame, maxHamming: Int): DataFrame = {
    val blocks = (0 until 4).map(i =>
      sig.withColumn("block", lit(i))
        .withColumn("bkey", expr(s"(simhash DIV ${1L << (i * 8)}) % 256")))
      .reduce(_ unionAll _)
    // a pair sharing k byte-blocks would join k times — keep it only at
    // its FIRST shared block (row-local when-chain over the two carried
    // signatures) instead of paying a distinct shuffle per candidate
    def byteOf(x: Column, b: Int): Column =
      expr(s"(${x.toString} DIV ${1L << (b * 8)}) % 256")
    val firstShared = (1 until 4).foldLeft(
      when(byteOf(col("a.simhash"), 0) === byteOf(col("b.simhash"), 0), 0)) {
      (acc, b) => acc.when(
        byteOf(col("a.simhash"), b) === byteOf(col("b.simhash"), b), b)
    }
    blocks.as("a").join(blocks.as("b"),
        col("a.block") === col("b.block") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.block") === firstShared)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Bounded-output dedup contract over [[simhashPairs]]: the pair
    * list is quadratic in near-dup cluster size (dup cliques — 426k
    * pairs at sf0.1), but the dedup CONSUMER only needs a canonical
    * parent per duplicate: min lower-id neighbor per doc, O(N) rows.
    * (The classic one-pass parent-pointer step; chains collapse in
    * later passes / union-find, exactly as in MapReduce dedup.)
    */
  def simhashCanonical(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    simhashPairs(docs, maxHamming)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(col("doc_a")).as("canonical_id"))

  /** Connected components over an undirected pair list — the dedup
    * CLUSTER step that [[simhashCanonical]]'s one-pass parent pointers
    * approximate: every node is labeled with the smallest id reachable
    * through any chain of near-dup pairs, so transitive duplicates
    * (a≈b, b≈c but a̸≈c) land in one cluster with one canonical id.
    *
    * Algorithm: distributed min-label propagation with pointer
    * jumping — per round, one hop of neighbor minima
    * (L(x) ← min(L(x), min over N(x) of L(y)); a keyed join + a keyed
    * min, both plain shuffles) followed by one shortcut
    * (L(x) ← L(L(x))), which contracts label chains geometrically, so
    * rounds ≈ log(diameter) instead of diameter (near-dup graphs are
    * clique-ish: 2 rounds + the convergence probe in practice). The
    * fixpoint — min id per component — is unique, so the result is
    * deterministic regardless of round count, and the DuckDB oracle
    * can compute it by recursive transitive closure instead of
    * replaying the iteration. Labels only ever decrease, so the SUM of
    * labels is a monotone convergence metric: one cheap agg action per
    * round, no row-diff join. State per round is one (node, label)
    * frame — O(|nodes|) — never the closure itself (which is Θ(Σ k²)
    * and exists only on the small-SF oracle side).
    */
  /** Edge-count gate below which [[connectedComponents]] solves the
    * paired subgraph with a SINGLE-TASK union-find instead of the
    * driver-coordinated loop (r16). Rationale: on a contracted
    * near-dup graph the paired subgraph is a few thousand edges while
    * the loop costs ~4 stages per round × ~5 rounds of KB-sized
    * shuffles — pure coordination latency. 2M symmetrized edges is
    * ~32 MB of task state (two longs + union-find parents), trivially
    * safe on any executor; a corpus whose pair graph exceeds it takes
    * the log-round loop unchanged. The gate reads the ALREADY-CACHED
    * edge list (the count is the cache-fill action the loop's seed
    * would have paid anyway), so choosing a path never adds a pass.
    * Same justified-escape-hatch rule as Layout.globalIndex's .rdd
    * drop: the closure replaces a fixed number of shuffles with one
    * bounded task, and the result — min id per component — is the
    * same unique fixpoint either way (DedupSpec pins local ≡ loop).
    */
  val CcLocalMaxEdges: Long = 2000000L

  def connectedComponents(pairs: DataFrame, nodes: DataFrame,
                          idCol: String = "doc_id",
                          audit: Option[CcAudit] = None,
                          localMaxEdges: Long = CcLocalMaxEdges): DataFrame = {
    // symmetrize with a row-local explode, NOT a union of two
    // projections: materializing a union's cache evaluates the pair
    // frame once per branch — for an upstream like simhashPairs that
    // doubles the single most expensive stage of the whole operator
    // pre-partitioned AND pre-sorted by dst INSIDE the cache: the
    // per-round neighbor join keys on dst, and a cached frame's
    // outputPartitioning/outputOrdering survive into the join plan, so
    // a sort-merge round elides the edge-side exchange + sort — only
    // the label frame moves. At sf0.1 this measures NEUTRAL (AQE sees
    // the 4k-row label side and broadcasts it, so sym never shuffles
    // either way); it is load-bearing at cluster scale, where the
    // label frame exceeds the broadcast threshold and an unpartitioned
    // edge list would re-exchange per round.
    val sym = OperatorCaches.track(pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst"))
      .sortWithinPartitions("dst"))

    // The iteration runs ONLY over nodes that appear in some pair —
    // singletons (the overwhelming majority of a lightly-duplicated
    // corpus) are identity-labeled by the final left join, so the
    // per-round state is O(|paired nodes|), not O(|corpus|). Every
    // label is a paired node (labels are minima over edge endpoints),
    // so the jump self-join stays total on the restricted set.
    //
    // localCheckpoint (EAGER), not cache(): the jump references its
    // input twice, so an uncut plan DOUBLES per round (measured:
    // Catalyst OOM by round ~4) — and the hop must be cut BEFORE the
    // jump, or the jump's two sides each recompute the sym-join (the
    // round's dominant cost; measured 3× slower when fused).
    // coalesce: the paired-node set can be EMPTY (no pairs at all) —
    // sum over zero rows is NULL, and the empty fixpoint is legitimate
    def sigOf(ls: DataFrame): Long =
      ls.agg(coalesce(sum(col("cluster_id")), lit(0L))).head().getLong(0)
    // the convergence probe (sum of labels — monotone, unique at the
    // fixpoint) RIDES each checkpoint job as an observe metric instead
    // of costing its own action. Metric delivery is async on the
    // listener bus, so the read is a bounded wait with the one-job
    // aggregate as fallback — never an unbounded block, and
    // bit-identical either way.
    def observed(df: DataFrame): (DataFrame, Long) = {
      val obs = new org.apache.spark.sql.Observation()
      val j = df
        .observe(obs, coalesce(sum(col("cluster_id")), lit(0L)).as("sig"))
        .localCheckpoint(true)
      // TIMED wait on the observation's own (public) future: only the
      // calling thread blocks, and a timeout falls back to the one-job
      // aggregate — unlike a Future(obs.get) wrapper, which on timeout
      // stranded one global-pool thread in the indefinite obs.get park
      // (plus its listener) per timed-out round
      val sig =
        try {
          import scala.concurrent.Await
          import scala.concurrent.duration.DurationInt
          Await.result(obs.future, 30.seconds).getAs[Long]("sig")
        } catch { case _: scala.concurrent.TimeoutException => sigOf(j) }
      (j, sig)
    }

    // == path gate (r16) ==
    // One count over the edge list fills the tracked cache (the action
    // the loop's seed would have paid anyway) and sizes the graph. A
    // paired subgraph under the gate is solved by a single bounded
    // union-find task reading the cache through coalesce(1) — no
    // shuffle, no rounds, no convergence machinery; the min-root
    // invariant (unions always attach the larger root under the
    // smaller) makes every final root the component minimum, i.e. the
    // loop's exact fixpoint, independent of edge order.
    val nEdges = sym.count()
    if (nEdges <= localMaxEdges) {
      audit.foreach(_.rounds = 0)
      val tupleEnc = org.apache.spark.sql.Encoders.product[(Long, Long)]
      val local = sym
        .select(col("src").as("_1"), col("dst").as("_2"))
        .as(tupleEnc)
        .coalesce(1)
        .mapPartitions { it =>
          // Primitive-long open-addressing parent table (r16 ADVICE):
          // the boxed HashMap[Long,Long] + Vector output buffer cost
          // ~150-300 MB at the 2M-edge gate; three flat arrays
          // (17 B/slot, load ≤ 0.75) put the gate-boundary graph at
          // ~70 MB and the output is a streamed iterator, never
          // buffered. Parents are stored as NODE IDS (not slot
          // indices), so a rehash just re-places (key, parent) pairs.
          var cap = 1 << 12
          var key = new Array[Long](cap)
          var used = new Array[Boolean](cap)
          var par = new Array[Long](cap)
          var size = 0
          def slotIn(k: Long, ks: Array[Long], us: Array[Boolean],
                     c: Int): Int = {
            var h = (java.lang.Long.hashCode(
              k * 0x9E3779B97F4A7C15L) & (c - 1))
            while (us(h) && ks(h) != k) h = (h + 1) & (c - 1)
            h
          }
          def rehash(): Unit = {
            val ok = key; val ou = used; val op = par; val oc = cap
            cap <<= 1
            key = new Array[Long](cap)
            used = new Array[Boolean](cap)
            par = new Array[Long](cap)
            var i = 0
            while (i < oc) {
              if (ou(i)) {
                val h = slotIn(ok(i), key, used, cap)
                used(h) = true; key(h) = ok(i); par(h) = op(i)
              }
              i += 1
            }
          }
          def slotOf(k: Long): Int = {
            var h = slotIn(k, key, used, cap)
            if (!used(h)) {
              if ((size + 1) * 4 >= cap * 3) {
                rehash(); h = slotIn(k, key, used, cap)
              }
              used(h) = true; key(h) = k; par(h) = k; size += 1
            }
            h
          }
          // NOTE every par(...) index is computed into a local FIRST:
          // slotOf can rehash and swap the arrays, and in
          // `par(slotOf(r))` Scala loads the array reference BEFORE
          // the index expression runs — a rehash in between indexes
          // (or writes!) the stale array.
          def root(x: Long): Long = {
            var r = x
            var s = slotOf(r)
            while (par(s) != r) { r = par(s); s = slotOf(r) }
            var c = x // path compression
            while (c != r) {
              val sc = slotOf(c); val nx = par(sc); par(sc) = r; c = nx
            }
            r
          }
          it.foreach { case (a, b) =>
            val ra = root(a); val rb = root(b)
            if (ra < rb) { val s = slotOf(rb); par(s) = ra }
            else if (rb < ra) { val s = slotOf(ra); par(s) = rb }
          }
          new Iterator[(Long, Long)] {
            private var i = 0
            def hasNext: Boolean = {
              while (i < cap && !used(i)) i += 1
              i < cap
            }
            def next(): (Long, Long) = {
              val k = key(i); i += 1; (k, root(k))
            }
          }
        }(tupleEnc)
        .toDF("node", "cluster_id")
      return nodes.select(col(idCol).as("node"))
        .join(local, Seq("node"), "left")
        .select(col("node").as(idCol),
          coalesce(col("cluster_id"), col("node")).as("cluster_id"))
    }

    // seed = the first hop with identity labels, join-free: the min
    // neighbor ID is a plain keyed min over the edge list (grouping
    // key usable inside the agg), restricted to paired nodes
    var (labels, prev) = observed(
      sym.groupBy(col("src").as("node"))
        .agg(least(min(col("dst")), col("src")).as("cluster_id")))
    var done = false
    var rounds = 0
    while (!done) {
      rounds += 1
      // neighbor minima as a LEFT JOIN + least, not a union: a union
      // whose second child re-reads the first child's frame trips
      // Union constraint rewriting ("key not found: node#…") on the
      // shared attribute ids; self-JOINs of one frame go through
      // DeduplicateRelations and are safe
      val nbrMin = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("nb_node"))
        .agg(min(col("cluster_id")).as("nb_min"))
      val hop = labels
        .join(nbrMin, col("node") === col("nb_node"), "left")
        .select(col("node"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id")))
            .as("cluster_id"))
      // ONE materialization per round (r16 optimization): the
      // pointer-jump shortcut dereferences through the PREVIOUS
      // round's labels — already checkpointed, so hop and shortcut
      // fuse into a single plan and a single job, where the previous
      // shape (hop checkpoint, then a separate self-join jump
      // checkpoint) paid two passes over the label frame per round.
      // Shortcutting through the old table is one monotone min-step
      // weaker per round than jump-through-new (hop ≤ prev pointwise),
      // but any schedule of monotone min updates reaches the SAME
      // unique fixpoint — min id per component — so the result is
      // bit-identical; only the round count can differ (measured: it
      // does not on the near-dup gate graphs — DedupSpec pins the
      // O(log) bound on worst-case chains).
      // Labels are always ids of paired nodes, so the inner
      // dereference join stays total; prev(l) ≤ l for every label l
      // (labels only decrease from the identity seed), so the
      // dereferenced value IS the min of the two.
      val (rooted, sig) = observed(
        hop.as("h").join(labels.as("p"),
            col("h.cluster_id") === col("p.node"))
          .select(col("h.node").as("node"),
            col("p.cluster_id").as("cluster_id")))
      done = sig == prev
      prev = sig
      labels = rooted
    }
    audit.foreach(_.rounds = rounds)
    // singletons re-enter with identity labels
    nodes.select(col(idCol).as("node"))
      .join(labels, Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("cluster_id"), col("node")).as("cluster_id"))
  }

  /** Dedup clusters over the [[simhashPairs]] near-dup graph: every
    * document (singletons included) mapped to its cluster's canonical
    * (minimum) doc id.
    *
    * SIGNATURE CONTRACTION: docs sharing an identical simhash are
    * hamming-0 neighbors, so they are one CC node by construction —
    * the iteration runs on one representative (min doc id) per
    * DISTINCT signature, and members re-join their rep's label at the
    * end. On a clique-ish near-dup corpus this collapses the edge
    * list from Θ(Σ clique²) to Θ(distinct-sig pairs) — measured at
    * sf0.1: 425,805 doc pairs → ~3k rep pairs, and the whole operator
    * 5.7 s → ~1.5 s — while the fixpoint is unchanged: the cluster
    * label is the min rep id reachable, and each rep is its group's
    * min doc id, so min-over-reps ≡ min-over-docs.
    */
  def simhashClusters(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = OperatorCaches.track(simhash(docs))
    val reps = OperatorCaches.track(
      sig.groupBy("simhash").agg(min("doc_id").as("doc_id")))
    val repLabels = connectedComponents(
      sigBlockPairs(reps, maxHamming).select("doc_a", "doc_b"),
      reps.select("doc_id"), "doc_id")
    sig.join(reps.withColumnRenamed("doc_id", "rep_id"), "simhash")
      .join(repLabels.withColumnRenamed("doc_id", "rep_id"), "rep_id")
      .select(col("doc_id"), col("cluster_id"))
  }

  /** MATERIALIZED cluster-label view — the one frame the cluster
    * family ([[simhashClusters]] itself, cluster-aware split, the
    * split-leakage audit) shares so the simhash→contraction→CC
    * fixpoint runs ONCE per corpus instead of once per consumer
    * (measured at sf0.1: the three consumers independently
    * recomputing the pipeline cost ~9.7 s of a 70 s suite; sharing
    * this view costs ≈ the most expensive single consumer). The frame
    * is registered in [[OperatorCaches]]: the first consumer pays the
    * fixpoint, later consumers read the cache, `releaseAll` returns
    * the storage.
    *
    * At table scale this IS a materialized view: persist the label
    * frame and refresh it INCREMENTALLY with
    * [[graft.streaming.StreamClusters]] — `Maintainer` folds
    * per-batch near-dup edges into a label store whose
    * `labelsFor(state, docs)` has exactly this frame's output
    * contract (StreamingSpec pins the parity), so a continuously
    * ingested corpus never recomputes the batch fixpoint at all.
    */
  def clusterLabels(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    OperatorCaches.track(simhashClusters(docs, maxHamming))

  /** Soft dedup: keep EVERY near-dup cluster member but emit a
    * training sampling weight of 1/cluster_size — the downweighting
    * alternative to dropping duplicates (repeated content contributes
    * ~one document's worth of expected gradient instead of being
    * either discarded or over-trained). Rides the SHARED materialized
    * cluster-label view ([[clusterLabels]]), so the simhash→CC
    * fixpoint is not recomputed; the size count and the weight join
    * are both keyed on cluster_id (one bounded shuffle, no
    * per-document fan-out). 1/n on identical operands is
    * IEEE-identical cross-engine.
    */
  def softDedupWeights(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    weightsFromLabels(clusterLabels(docs, maxHamming))

  /** Size-window + 1/size tail shared verbatim by the batch operator
    * and [[graft.streaming.StreamClusters.softWeightsFor]] (batch ≡
    * stream by construction). Size via a window, not
    * groupBy+self-join: the label view is consumed ONCE (the CC
    * fixpoint materializes once even uncached) and the whole tail is
    * a single cluster_id-keyed exchange.
    */
  private[graft] def weightsFromLabels(labels: DataFrame,
                                       idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
    labels
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        (lit(1.0) / col("cluster_size").cast("double")).as("weight"))
  }

  /** Quality-aware canonical selection: per near-dup cluster the
    * representative is the HIGHEST-QUALITY member (ties to the
    * smaller doc_id) — the curation-grade upgrade over min-id
    * canonicals: when boilerplate variants cluster together, the kept
    * copy should be the best-written one, not the one that happened
    * to get the smallest id. Rides the shared materialized
    * cluster-label view; the quality score is row-local
    * ([[TextAnalysis.qualityScore]]); one cluster-keyed exchange pays
    * for the rank and the representative broadcast together
    * (first_value over the same window frame).
    */
  def bestOfCluster(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val labels = clusterLabels(docs, maxHamming)
    val quality = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    labels.join(quality, "doc_id")
      .withColumn("canonical_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        col("quality"), (col("doc_id") === col("canonical_id"))
          .as("is_canonical"))
  }

  /** Cross-source near-dup overlap matrix — which corpus sources
    * duplicate into which (the dedup-planning view: a crawl snapshot
    * vs a curated set, two snapshots of the same crawl, etc.):
    * [[simhashPairs]] near-dup pairs joined to each side's `source`
    * label, counted per unordered source pair. The diagonal is
    * within-source duplication; off-diagonal cells say which source
    * pairs share content — the number that decides whether a new
    * source is worth ingesting before any doc-level work runs.
    *
    * Scale: rides the banded pair join (never all-pairs); the two
    * label joins are keyed on doc id, and the result is bounded by
    * |sources|², a broadcast-sized matrix at any corpus size.
    */
  def sourceOverlap(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    simhashPairs(docs, maxHamming)
      .select("doc_a", "doc_b")
      .join(src.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("source", "src_a"), "doc_a")
      .join(src.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("source", "src_b"), "doc_b")
      .groupBy(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Substring-level duplication profile — the exact-substring-dedup
    * family (suffix-array dedup à la "Deduplicating Training Data
    * Makes Language Models Better"): instead of a doc-level verdict,
    * measure per document how much of its CONTENT is verbatim-shared
    * with any other document. Strided k-char windows are hashed and
    * counted corpus-wide; a window present in ≥2 distinct docs is a
    * repeated span. Output per doc: window counts and the repeated
    * fraction — the score a span-removal pass would threshold on.
    *
    * Scale shape: the suffix array of the published method is replaced
    * by the windowed equivalent a distributed engine wants — one
    * explode (|text|/stride rows per doc), one groupBy on the window
    * hash (the only wide shuffle, same volume as the shingle df pass),
    * one keyed join back + per-doc aggregate. No suffix structure, no
    * cross-doc pair enumeration.
    *
    * MEASURED accuracy vs the exact sweep (r14 verdict Next #5 —
    * `stride = 1` IS the exact full n-gram profile; the strided form
    * samples its window set, so strided repeats are a SUBSET of exact
    * repeats: flag precision is structurally 1.0). At sf0.01/sf0.001,
    * k=20, default stride 10 vs exact: repeated_frac MAE 0.055/0.052,
    * corr 0.99, and the ≥0.5-threshold scrub decision — the documented
    * use — agrees with exact at recall 1.0 / precision 1.0. The
    * strided form is NOT a detector of "has ANY repeated span": that
    * flag's recall reads 0.28/0.32 (misaligned cross-doc spans fall
    * between sampled starts). Callers needing span DETECTION should
    * pass stride = 1 and pay the ~stride× window volume (measured in
    * SCALE_r15); callers thresholding a duplication SCORE keep the
    * default. DocOpsSpec pins all three numbers.
    */
  /** Reject inputs whose plan carries nondeterministic expressions —
    * the guard for operators that deliberately evaluate their input
    * TWICE instead of caching it (the O(1)-memory trade): a rand()
    * filter or projection would hand the two passes different
    * snapshots and silently corrupt the result. Plan-level, so the
    * check costs nothing at runtime; a cached/localCheckpointed frame
    * passes (its plan is the materialized scan).
    */
  private[graft] def requireDeterministicInput(df: DataFrame,
                                               op: String): Unit = {
    val bad = df.queryExecution.analyzed.collect {
      case p => p.expressions.filterNot(_.deterministic)
    }.flatten
    require(bad.isEmpty,
      s"$op evaluates its input twice (uncached streaming passes); " +
        s"nondeterministic expressions would give the passes different " +
        s"snapshots: ${bad.take(3).mkString(", ")} — cache() or " +
        s"localCheckpoint() the input to fix a snapshot first")
  }

  def repeatedSubstrings(docs: DataFrame, k: Int = 20,
                         stride: Int = 10): DataFrame = {
    val starts = when(length(col("text")) >= k,
      sequence(lit(1), length(col("text")) - (k - 1), lit(stride)))
      .otherwise(array().cast("array<int>"))
    // NOT cached (r15): the cache pinned |text|/stride rows of
    // (doc_id, md5) in executor storage — at the stride=1 exact sweep
    // that is the corpus's entire character volume, and 217M cached
    // window rows OOM'd the 100x rehearsal JVM. Uncached, the window
    // generation runs twice (once per consumer) but every pass is
    // fully streaming: scan -> explode -> md5 -> shuffle, zero
    // resident state. 2x compute for O(1) memory is the right side of
    // the trade for an operator whose exact mode is corpus-character-
    // sized by definition. Caveat that comes with the trade: the two
    // consumers evaluate `docs` independently, so a NONDETERMINISTIC
    // input (rand() projections/filters) would give freq and the join
    // different snapshots — ENFORCED below (r15 ADVICE #4), not just
    // documented: such inputs are rejected; cache/localCheckpoint the
    // frame upstream to fix a snapshot first. Every in-repo caller is
    // a parquet scan.
    requireDeterministicInput(docs, "repeatedSubstrings")
    val wins = graft.sources.Par.fan(docs)
      .select(col("doc_id"), col("text"), explode(starts).as("i"))
      .select(col("doc_id"), md5(expr(s"substr(text, i, $k)")).as("h"))
    val freq = wins.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    val perDoc = wins.join(freq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_repeated"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        when(coalesce(col("n_windows"), lit(0L)) > 0,
          col("n_repeated").cast(DoubleType) / col("n_windows"))
          .as("repeated_frac"))
  }

  /** Duplicated-span REMOVAL — the transform [[repeatedSubstrings]]
    * only profiles: the document is cut into NON-overlapping
    * `blockTokens`-token blocks (full blocks only; the `< blockTokens`
    * token tail is always kept), every block whose text occurs ≥2
    * times corpus-wide — any document, any position, including
    * within-doc repeats — is dropped, and the document is REBUILT
    * from the surviving blocks in original order plus the tail.
    * Non-overlapping blocks make the rebuild well-defined (overlapping
    * windows can't be removed without double-cutting shared text —
    * why the profiling op and the removal op use different framings).
    *
    * Output per doc: `clean_text`, block counts, and dropped-block
    * count — the boilerplate-scrub pass of the published
    * exact-substring dedup, reshaped for a distributed engine.
    *
    * Scale shape: one explode (|tokens|/blockTokens rows per doc), one
    * groupBy on the block hash (the only wide shuffle), one keyed join
    * back, and a per-doc ordered re-assembly whose partition key is
    * doc_id — bounded by a single document's block count, never by the
    * corpus.
    */
  def substringScrub(docs: DataFrame, blockTokens: Int = 10): DataFrame = {
    val toked = graft.sources.Par.fan(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("nb", (col("n") / blockTokens).cast("int"))
    val cached = OperatorCaches.track(toked)
    // nb = 0 guard: sequence(1, 0) runs DESCENDING in Spark
    val blocks = cached
      .select(col("doc_id"),
        posexplode(expr(s"""CASE WHEN nb >= 1 THEN
          |  transform(sequence(1, nb),
          |    b -> concat_ws(' ', slice(toks, (b - 1) * $blockTokens + 1,
          |      $blockTokens)))
          |  ELSE CAST(array() AS array<string>) END""".stripMargin)))
      .select(col("doc_id"), col("pos").as("idx"),
        md5(col("col")).as("h"), col("col").as("block"))
    val withFreq = OperatorCaches.track(
      blocks.join(blocks.groupBy("h").agg(count(lit(1)).as("occ")), "h"))
    val kept = withFreq.filter(col("occ") < 2)
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("idx"), col("block")))),
          s => s("block"))).as("kept_text"))
    val dropped = withFreq.groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("n_dropped"))
    cached
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("nb") * blockTokens + 1,
          greatest(col("n") - col("nb") * blockTokens, lit(0))))
          .as("tail_text"))
      .join(kept, Seq("doc_id"), "left")
      .join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(" ", filter(array(col("kept_text"), col("tail_text")),
          x => x.isNotNull && x =!= "")).as("clean_text"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Per-document n-gram NOVELTY — the curriculum/ingest-ordering
    * signal: how much of a document's distinct n-gram set is seen
    * here FIRST (attribution by min doc_id — the deterministic stand-
    * in for ingest order). A crawl snapshot appended after a curated
    * corpus reads near-zero novelty; genuinely new material reads
    * high. The integer-ratio `novelty` is exact in any engine.
    *
    * Scale shape: rides the same (doc_id, gram) explode as the
    * shingle family — one gram-keyed groupBy for the introducer, one
    * gram-keyed join back, one doc-keyed aggregate. Never a pair
    * join.
    */
  def ngramNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val g = OperatorCaches.track(ngrams(docs, n))
    val intro = g.groupBy("sh").agg(min(col("doc_id")).as("intro_id"))
    noveltyFromIntro(docs, g, intro)
  }

  /** Shared scoring tail of [[ngramNovelty]] and its maintained
    * streaming twin ([[graft.streaming.StreamNovelty]]): per-doc gram
    * counts + introducer matches off a (doc_id, sh) gram view and an
    * (sh, intro_id) attribution view — ONE definition so the pinned
    * batch ≡ stream output contract can't drift. A gram absent from
    * `intro` (the stream's already-seen case) is novel for no one.
    */
  private[graft] def noveltyFromIntro(docs: DataFrame, g: DataFrame,
                                      intro: DataFrame): DataFrame = {
    val per = g.join(intro, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("intro_id"), 1L).otherwise(0L))
          .as("n_novel"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          col("n_novel").cast(DoubleType) / col("n_grams")).as("novelty"))
  }

  /** INCREMENTAL dedup — the production shape: classify each document
    * of an incoming batch against the existing corpus without ever
    * re-pairing the corpus with itself. `dup_exact` = verbatim text
    * already in the corpus (hash semi-join); `dup_near` = shares a
    * MinHash-LSH band bucket with any corpus doc (band-key semi-join —
    * candidate probes, not pairs); else `new`. Cost per batch is
    * O(|batch| + matching buckets), independent of corpus-internal
    * duplication — the reason incremental ingest at 100 TB runs
    * per-batch instead of re-running global dedup. Signatures are
    * computed in ONE pass over batch ∪ corpus (same document-frequency
    * cap as the global operators), then split by the predicate.
    */
  def incrementalDedup(docs: DataFrame, batchPred: Column,
                       numHashes: Int = 8, bands: Int = 2): DataFrame = {
    val tagged = docs.select(col("doc_id"), col("text"),
      batchPred.as("is_new"))
    val batch = tagged.filter(col("is_new"))
    val corpus = tagged.filter(!col("is_new"))
    val exactIds = batch.join(
        corpus.select(md5(col("text")).as("eh")).distinct(),
        md5(col("text")) === col("eh"), "left_semi")
      .select(col("doc_id"))
    val keys = OperatorCaches.track(
      bandKeys(minhashSignatures(docs, numHashes), numHashes, bands)
        .join(tagged.select("doc_id", "is_new"), "doc_id"))
    val nearIds = keys.filter(col("is_new")).as("a")
      .join(keys.filter(!col("is_new")).as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"),
        "left_semi")
      .select(col("doc_id")).distinct()
    batch.select(col("doc_id"))
      .join(exactIds.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, "dup_exact")
          .when(col("is_near") === 1, "dup_near")
          .otherwise("new").as("status"))
  }
}
