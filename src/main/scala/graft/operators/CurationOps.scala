package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators for large-scale training-data pipelines:
  * intra-document repetition screening (the Gopher/MassiveText quality
  * rules), benchmark-contamination detection, deterministic hash-based
  * dataset splits, and weighted domain mixing (up/down-sampling).
  *
  * Everything here is either a pure per-row projection (repetition,
  * split, mixing) or a broadcast semi-join against a SMALL benchmark set
  * (contamination) — no operator shuffles the corpus, so each scales
  * linearly with input and parallelizes per-partition at any corpus
  * size. Cross-engine determinism: derived numbers are integer counts or
  * single-rounded IEEE divisions of exact integers (see
  * [[graft.queries.Q]] doctrine).
  */
object CurationOps {

  private def words(textCol: Column): Column = TextOps.tokens(textCol)

  /** Word n-grams of `textCol` as space-joined strings — exactly
    * [[DedupOps.shingles]] (same tokenization, same short-doc guard,
    * same lambda-bound single-pass form); aliased here under the
    * curation vocabulary so the two idioms cannot drift apart.
    */
  def wordNgrams(textCol: Column, n: Int): Column =
    DedupOps.shingles(textCol, n)

  /** Gopher-style intra-document repetition statistics: fraction of
    * duplicate words / 2-grams / 3-grams (1 − distinct/total). High
    * values flag boilerplate and degenerate repetition; the usual
    * filter keeps dup_2gram_frac below ~0.2. Pure projection.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // the gram array binds to a lambda variable so it evaluates once per
    // row despite the three references (size ×2, array_distinct)
    def dupFrac(grams: Column): Column =
      element_at(transform(array(grams), g =>
        when(size(g) === 0, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(g)).cast(DoubleType) /
            size(g).cast(DoubleType))), 1)
    val w = words(col(textCol))
    docs.select(
      col("doc_id"),
      size(w).cast(LongType).as("n_words"),
      dupFrac(w).as("dup_word_frac"),
      dupFrac(wordNgrams(col(textCol), 2)).as("dup_2gram_frac"),
      dupFrac(wordNgrams(col(textCol), 3)).as("dup_3gram_frac"))
  }

  /** Benchmark-contamination screen: for each corpus document, how many
    * of its distinct word n-grams appear anywhere in the benchmark set,
    * and the contaminated fraction. Classic decontamination shape
    * (GPT-2/3, The Pile): an n-gram of ~8+ words shared with an eval
    * benchmark marks the document for dropping.
    *
    * The benchmark side is DISTINCT n-grams only and benchmarks are
    * orders of magnitude smaller than the corpus, so the join is a
    * BROADCAST hash semi-probe — the 100 TB corpus side never shuffles;
    * each doc row carries its distinct grams and probes the broadcast
    * set. Only matched docs return (left out = clean).
    */
  def contaminationScreen(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      textCol: String = "text"): DataFrame = {
    val benchGrams = benchmark
      .select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    // two-step on purpose: project the distinct-gram ARRAY once, then
    // explode + size over the column reference. Writing the ngram
    // expression directly beside the explode re-evaluates the whole
    // pipeline per OUTPUT row (quadratic in doc length — measured 20×);
    // as a doubly-referenced non-cheap expression, CollapseProject keeps
    // this projection below the Generate, so it runs once per document.
    val docGrams = corpus
      .select(col("doc_id"),
        array_distinct(wordNgrams(col(textCol), n)).as("grams"))
      .select(col("doc_id"), explode(col("grams")).as("gram"),
        size(col("grams")).as("n_grams"))
    docGrams
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_contaminated"),
        col("n_contaminated").cast(DoubleType) /
          col("n_grams").cast(DoubleType)).toDF(
        "doc_id", "n_contaminated", "contaminated_frac")
  }

  /** Tokenizer-aware sliding-window chunking: split each document into
    * fixed-size token windows with `overlap` tokens of context carried
    * between consecutive chunks (stride = chunkTokens − overlap), the
    * standard shape for packing long documents into a training context
    * window. Output one row per chunk: (doc_id, chunk_id, n_tokens,
    * chunk). The window arithmetic is a per-row expression tree over the
    * bound token array and the explode is the only row expansion — no
    * shuffle, parallel per partition at any corpus size. The final
    * (short) window still emits; empty docs yield one empty chunk row,
    * a document is never silently dropped.
    */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 128,
      overlap: Int = 0, textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val stride = chunkTokens - overlap
    // chunk starts: 1, 1+stride, … up to n − overlap (a later start would
    // hold only tokens the previous window already covered) —
    // ceil(max(n − overlap, 1) / stride) windows cover every token
    val chunks = element_at(transform(array(words(col(textCol))), w =>
      transform(
        sequence(lit(1), greatest(size(w) - overlap, lit(1)), lit(stride)),
        start => slice(w, start, lit(chunkTokens)))), 1)
    docs
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_id", "toks")))
      .select(col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        concat_ws(" ", col("toks")).as("chunk"))
  }

  /** Knuth multiplicative hash bucket in [0, buckets) — plain integer
    * arithmetic, so ANY engine (and the DuckDB oracle) reproduces it
    * bit-for-bit, unlike engine-specific hash builtins. Stable across
    * runs, partitioning, and cluster size by construction.
    *
    * The id pre-reduces into [0, 2^31) before the multiply so the
    * product can never overflow Int64 (2^31 · 2654435761 < 2^63 —
    * ANSI mode would otherwise throw for ids above ~3.4e9), and pmod
    * keeps negative ids non-negative. For ids in [0, 2^31) — every id
    * the testdata and any sane doc-id scheme uses — the pre-reduction
    * is the identity and the oracle SQL mirrors the arithmetic exactly.
    */
  def hashBucket(idCol: Column, buckets: Int = 100): Column = {
    val r = pmod(idCol.cast(LongType), lit(1L << 31))
    pmod(r * lit(2654435761L), lit(1L << 32)) % buckets
  }

  /** HTML boilerplate strip — the text-extraction pass every crawl
    * pipeline runs before curation (C4/CCNet extract text upstream of
    * all filters): drop script/style subtrees WITH their content, drop
    * comments, drop remaining tags, decode the five predefined
    * entities, collapse runs of whitespace. A deterministic
    * regexp-chain projection (zero shuffle); a layout-aware extractor
    * (trafilatura-class) is a modeling choice layered ON this plumbing,
    * not a different plan shape.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTag,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
        "&apos;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Canonical URL normalization — the crawl-curation pass that makes
    * URL-level dedup meaningful (the C4/CommonCrawl pipelines dedup by
    * normalized URL before any content pass): lowercase the scheme and
    * host, drop a default port, drop the fragment, drop tracking
    * parameters (utm_*, fbclid, gclid, ref), SORT the surviving query
    * parameters (order is not identity), and strip one trailing slash
    * from a non-root path. Pure expression tree over builtins
    * (regexp captures + filter/array_sort/concat_ws lambdas) — zero
    * shuffle, codegen-friendly, scale-free; the dedup that follows is
    * one exact hash-groupBy on the canonical string.
    */
  def canonicalUrl(url: Column): Column = {
    // scheme://[userinfo@]host[:port][/path][?query][#fragment]
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val authority = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo is dropped (it is not page identity); IPv6 literals keep
    // their brackets and split host/port at the closing bracket
    val hostPort = regexp_replace(authority, "^[^@]*@", "")
    val isV6 = hostPort.startsWith("[")
    val host = when(isV6,
        lower(regexp_extract(hostPort, "^(\\[[^\\]]*\\])", 1)))
      .otherwise(lower(regexp_extract(hostPort, "^([^:]*)", 1)))
    val port = when(isV6, regexp_extract(hostPort, "\\]:(\\d+)$", 1))
      .otherwise(regexp_extract(hostPort, "^[^:]*:(\\d+)$", 1))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // the query is the span after the FIRST pre-fragment '?' — a '?'
    // first appearing inside the fragment must not fabricate one
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val kept = filter(
      when(query === "", array().cast("array<string>"))
        .otherwise(split(query, "&")),
      p => !(lower(p).rlike("^(utm_[a-z]+|fbclid|gclid|ref)=")) && p =!= "")
    val canonQ = concat_ws("&", array_sort(kept))
    // trailing slashes collapse entirely and the empty path unifies with
    // root "/" — the canonical form is a FIXPOINT, and the crawl's most
    // common duplicate pair (bare host vs root slash) collapses
    val stripped = regexp_replace(path0, "/+$", "")
    val canonPath = when(stripped === "", lit("/")).otherwise(stripped)
    // a scheme-less string is not a URL this pass owns — pass through
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        canonPath,
        when(canonQ =!= "", concat(lit("?"), canonQ)).otherwise(lit(""))))
  }

  /** Full-resolution multiplicative hash in [0, 2^32) — the sort key
    * behind [[sampleKPerGroup]]'s reproducible pseudo-random order.
    */
  private def hashOrder(idCol: Column): Column = {
    val r = pmod(idCol.cast(LongType), lit(1L << 31))
    pmod(r * lit(2654435761L), lit(1L << 32))
  }

  /** Deterministic stratified sample: (up to) `k` documents per group,
    * chosen by ranking the multiplicative id hash within the group — a
    * reproducible pseudo-random order independent of engine, run,
    * partitioning, and cluster size (Spark's `sample()` is none of
    * those). Ties (hash collisions) break by id. One keyed shuffle for
    * the rank; at 100 TB this is the "inspect/evaluate N docs per
    * domain" pass, and the selection only changes for groups whose
    * membership changed.
    */
  def sampleKPerGroup(docs: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic train/validation/test split: percent-weighted cut of
    * the hash-bucket space. `cuts` are cumulative upper percents, e.g.
    * train 90 / val 5 / test 5 = Seq(("train",90),("val",95),
    * ("test",100)). Pure projection — a document's split never depends
    * on the rest of the data, so splits stay stable as the corpus grows.
    */
  def hashSplit(docs: DataFrame, cuts: Seq[(String, Int)],
      idCol: String = "doc_id"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100,
      s"cumulative cuts must end at 100, got $cuts")
    require(cuts.map(_._2) == cuts.map(_._2).sorted &&
        cuts.map(_._2).distinct == cuts.map(_._2),
      s"cumulative cuts must be strictly increasing, got $cuts — " +
        "an out-of-order cut would silently shadow a later label")
    val b = hashBucket(col(idCol))
    val expr = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, upper), rest) => when(b < upper, lit(name)).otherwise(rest)
    }
    docs.withColumn("split", expr)
  }

  /** PII patterns scanned by [[piiScrub]]: (kind, regex, replacement).
    * Restricted to the RE2-compatible subset of Java regex (no
    * backreferences, no lookaround) so the engine (java.util.regex) and
    * any SQL oracle (RE2) agree match-for-match. Order matters: emails
    * are scrubbed before IPs so the host part of `user@10.2.3.4` is
    * consumed by the email rule, and IPs before phones so a dotted
    * quad can never be re-read as a partial phone.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** PII detection + redaction (the C4/Dolma pre-training scrub): count
    * each PII kind per document and emit the text with every match
    * replaced by its placeholder, applying [[piiPatterns]] in order so
    * later rules run on the already-scrubbed text. Pure projection —
    * regexp_count/regexp_replace stay inside whole-stage codegen, no
    * shuffle at any corpus size.
    */
  def piiScrub(docs: DataFrame, textCol: String = "text",
      patterns: Seq[(String, String, String)] = piiPatterns): DataFrame = {
    // counts are measured on the ORIGINAL text (what was found), while
    // redaction is sequential (what each later rule still sees)
    val counts = patterns.map { case (kind, re, _) =>
      regexp_count(col(textCol), lit(re)).cast(LongType).as(s"n_$kind")
    }
    val redacted = patterns.foldLeft(col(textCol)) {
      case (c, (_, re, rep)) => regexp_replace(c, re, rep)
    }
    docs.select(col("doc_id") +: counts :+ redacted.as("redacted"): _*)
  }

  /** Non-overlapping fixed-size token windows of `textCol`, each
    * re-joined to a string — the segmenter the synthetic corpus (no
    * newlines) feeds to [[dedupSegments]]; a real deployment passes
    * `split(text, '\n')` lines or a sentence splitter instead.
    */
  def tokenWindows(textCol: Column, windowTokens: Int): Column = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    element_at(transform(array(words(textCol)), w =>
      transform(
        sequence(lit(1), greatest(size(w), lit(1)), lit(windowTokens)),
        start => concat_ws(" ", slice(w, start, lit(windowTokens))))), 1)
  }

  /** Cross-corpus segment-level dedup (the CCNet/Dolma line-dedup shape):
    * drop every segment (line / sentence / token window — any
    * array-of-string `segs` expression) that occurs verbatim in at least
    * `minDocs` DISTINCT documents, and reassemble each document from its
    * surviving segments in original order. Boilerplate headers, cookie
    * banners and licence blocks repeat across pages; this removes them
    * corpus-wide without dropping whole documents.
    *
    * Scale: two hash shuffles, both on the segment string — the
    * doc-frequency aggregate (partial-agg'd map-side) and the
    * frequency→segment join — then one groupBy doc_id to reassemble.
    * Each is linear in total segment count; a 100 TB corpus dedups in
    * one pass with no driver state. The reassembly collect_list holds
    * one document's segments — bounded by max doc length, not corpus
    * size.
    */
  def dedupSegments(docs: DataFrame, segs: Column, minDocs: Int = 2,
      delim: String = " "): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // posexplode_OUTER: a segmenter returning an empty array (e.g. a
    // sentence splitter on a whitespace-only doc) must yield an
    // n_segments=0 row, not silently delete the document
    val exploded = docs
      .select(col("doc_id"), posexplode_outer(segs).as(Seq("seg_idx", "seg")))
    // consumed twice (doc-frequency agg + rejoin side) and deliberately
    // NOT cached: the exploded corpus is the largest frame in the
    // pipeline, and re-running a stateless projection per branch is
    // linear map-side work — materializing it is what wouldn't scale
    // count DISTINCT docs per segment: intra-doc repetition alone must
    // not mark a segment as boilerplate (repetitionStats owns that)
    val dupSegs = exploded
      .filter(col("seg").isNotNull)
      .groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("seg_df"))
      .filter(col("seg_df") >= minDocs)
      .select(col("seg"), lit(true).as("is_dup"))
    exploded
      .join(dupSegs, Seq("seg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("seg")).as("n_segments"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(
              col("is_dup").isNull && col("seg").isNotNull,
              struct(col("seg_idx"), col("seg"))))),
            s => s.getField("seg")),
          delim).as("clean_text"))
  }

  /** Corpus unigram counts: (word, cnt) plus the totals every scorer
    * needs. One partial-aggregated shuffle over the exploded words.
    */
  def unigramModel(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Unigram language-model scoring with Laplace smoothing (the CCNet
    * quality-filter shape: score docs against a reference corpus's
    * unigram distribution; unusually improbable docs are gibberish,
    * unusually probable ones are boilerplate). Emitted per doc:
    * n_words, n_oov (words unseen in the model), and the mean smoothed
    * token probability score = Σ(cnt_w + 1) / (n_words · (total + vocab))
    * — all-integer arithmetic until ONE final double division, so any
    * engine reproduces the score bit-for-bit.
    *
    * Scale: the word→cnt join is Zipf-skewed (a handful of stopwords
    * carry most of the mass), so the model splits: the `topK` heaviest
    * words resolve map-side from a BROADCAST map (covers the bulk of
    * token occurrences, no shuffle), and only the long tail — near-
    * uniform by construction — shuffle-joins. A plain hash join here
    * would send every "the" to one partition.
    */
  def unigramScore(docs: DataFrame, model0: DataFrame, topK: Int = 1000,
      textCol: String = "text"): DataFrame = {
    // cache an internal ALIAS of the model (word→cnt is one aggregated
    // shuffle consumed four times below: totals, hot, hotMap, tail).
    // Wrapping in a projection gives the cache manager a distinct plan,
    // so releasing it can never drop a persist() the CALLER holds on
    // their own frame.
    val model = model0.select(col("word"), col("cnt"))
    CacheOnce.untilConsumed(model)
    val totals = model.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("vocab"))
    val hot = model.orderBy(col("cnt").desc, col("word")).limit(topK)
    val hotMap = hot.agg(
      map_from_entries(collect_list(struct(col("word"), col("cnt"))))
        .as("hot_cnts"))
    val tail = model.join(hot.select(col("word")), Seq("word"), "left_anti")
    val tokens = docs
      .select(col("doc_id"), explode(words(col(textCol))).as("word"))
      .crossJoin(broadcast(hotMap))
      .select(col("doc_id"), col("word"),
        // try_element_at: a missing key is the expected signal for "not
        // a hot word" (ANSI element_at would throw)
        try_element_at(col("hot_cnts"), col("word")).as("hot_cnt"))
    // tokens feeds BOTH branches of the hot/tail union and is
    // deliberately NOT cached: it is the exploded corpus (one row per
    // token) — re-running the stateless scan+explode+broadcast-probe
    // projection per branch is linear map-side work, while materializing
    // the corpus's largest intermediate is what wouldn't survive 100 TB
    // tail join only for words the broadcast map missed; cnt 0 = OOV
    val scored = tokens.filter(col("hot_cnt").isNotNull)
      .select(col("doc_id"), col("hot_cnt").as("cnt"))
      .unionAll(tokens.filter(col("hot_cnt").isNull)
        .join(tail, Seq("word"), "left")
        .select(col("doc_id"), coalesce(col("cnt"), lit(0L)).as("cnt")))
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("cnt") === 0L, 1L).otherwise(0L)).as("n_oov"),
        sum(col("cnt") + 1L).as("sum_sm"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_words"), col("n_oov"),
        (col("sum_sm").cast(DoubleType) /
          (col("n_words") * (col("total") + col("vocab"))).cast(DoubleType))
          .as("lm_score"))
  }

  /** Weighted domain mixing: replicate each document `w` times where the
    * per-group weight w may be fractional — floor(w) guaranteed copies
    * plus one more for the hash-fraction of documents (deterministic,
    * not sampled), so the EXPECTED mix matches the weights exactly and
    * the realized mix is reproducible. w < 1 down-samples, w > 1
    * up-samples; each copy carries `copy_no` for downstream shuffling.
    * The weight table is tiny (one row per domain) → broadcast join;
    * replication is a per-row generator (no shuffle, no skew: a heavy
    * domain's copies stay spread across its source partitions).
    */
  def mixCorpus(docs: DataFrame, weights: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val wcols = weights.columns.toSet
    require(wcols.contains("weight"),
      s"weights needs a 'weight' column, got ${weights.columns.toSeq}")
    // copies = floor(w) + (bucket < frac(w)·1000 ? 1 : 0); weight is
    // ROUNDED to milli-units — a truncating cast would turn 0.7 (IEEE
    // 699.999…) into 699 milli and mis-replicate one doc per thousand
    val milli = round(col("weight") * 1000).cast(LongType)
    val extra = when(
      hashBucket(col("doc_id"), 1000) < milli % 1000, 1L).otherwise(0L)
    val copies = (milli / 1000L + extra).cast(IntegerType)
    // sequence(1, 0) would count DOWN ([1,0]); zero copies must be an
    // empty array so explode drops the row
    val reps = when(copies >= 1, sequence(lit(1), copies))
      .otherwise(array().cast(ArrayType(IntegerType)))
    // LEFT join + loud error: a group missing from the weight table must
    // not silently vanish (an intentional drop is an explicit 0.0 row) —
    // at corpus scale, data drift adding a new domain would otherwise
    // delete it from the mix with no signal
    docs.join(broadcast(weights), groupCols, "left")
      .withColumn("copy_no", explode(when(col("weight").isNull,
        raise_error(concat(lit("mixCorpus: no weight for group ("),
          concat_ws(",", groupCols.map(col): _*), lit(")"))))
        .otherwise(reps)))
      .drop("weight")
  }

  /** Bloom-prefiltered membership screen — the cross-corpus "have we
    * seen this key" join at scales where the seen-set is too big to
    * broadcast but its Bloom image is not (the runtime-filter /
    * Bloom-join pattern Spark itself injects for selective joins;
    * `df.stat.bloomFilter` builds the image distributed, one
    * treeAggregate, no shuffle of the corpus).
    *
    * Exactness is preserved: the Bloom has NO false negatives, so for
    * `anti = true` (keep unseen rows — dedup against a seen corpus) the
    * definite-negative rows pass through join-free and only the
    * bloom-positive sliver (|true matches| + fpp·|corpus|) pays the
    * exact anti-join; for semi (keep seen rows) the sliver pays an
    * exact semi-join that removes the false positives. At 100 TB with a
    * 1% seen-rate, ~99% of the corpus never shuffles.
    *
    * The probe is a broadcast-task-local `mightContain` — a hash check
    * against the shared image; the saved corpus shuffle dominates the
    * non-codegen probe cost by orders of magnitude.
    */
  def bloomScreen(corpus: DataFrame, seen: DataFrame, keyCol: String,
      seenKeyCol: String, expectedItems: Long, fpp: Double = 0.01,
      anti: Boolean = false): DataFrame = {
    val bloom = seen.stat.bloomFilter(seenKeyCol, expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val isString = corpus.schema(keyCol).dataType ==
      org.apache.spark.sql.types.StringType
    val might =
      if (isString) udf((k: String) => k != null && bc.value.mightContainString(k))
      else udf((k: Long) => bc.value.mightContainLong(k))
    val seenKeys = seen.select(col(seenKeyCol).as(keyCol)).distinct()
    if (anti) {
      val residual = corpus.filter(might(col(keyCol)))
        .join(seenKeys, Seq(keyCol), "left_anti")
      corpus.filter(!might(col(keyCol))).unionByName(residual)
    } else {
      corpus.filter(might(col(keyCol)))
        .join(seenKeys, Seq(keyCol), "left_semi")
    }
  }
}
