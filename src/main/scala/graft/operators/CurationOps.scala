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
}
