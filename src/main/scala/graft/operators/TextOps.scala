package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language identification
  * (stopword-set heuristic), and document fingerprinting (rolling hash).
  *
  * All operators are pure Catalyst expressions (no UDFs) so they stay
  * inside whole-stage codegen and scale linearly with executors — at
  * 100 TB the only cost is the scan plus per-row compute; no shuffle is
  * introduced by any of them.
  */
object TextOps {

  /** Whitespace tokenizer (the convention of the synthetic corpus). */
  def tokens(textCol: Column): Column = split(textCol, " ")

  /** 64-bit-ish (60-bit, always positive) deterministic word hash that both
    * the engine and SQL oracles can compute: first 15 hex digits of md5 —
    * evaluated natively ([[graft.functions.Md5Prefix60]] reads the digest
    * bytes directly; value-identical to the composed
    * `conv(substring(md5(c), 1, 15), 16, 10)` form the oracles mirror).
    */
  def wordHash(c: Column): Column = graft.functions.Md5Prefix60(c)

  /** SQL-oracle twin of [[wordHash]] (DuckDB syntax). */
  def wordHashSql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Token count + length stats per document. */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    docs.select(
      col("doc_id"),
      size(w).cast(LongType).as("n_tokens"),
      size(array_distinct(w)).cast(LongType).as("n_unique_tokens"),
      length(col(textCol)).cast(LongType).as("n_chars"),
      aggregate(transform(w, x => length(x).cast(LongType)), lit(0L), _ + _)
        .as("sum_token_chars"))
  }

  /** Heuristic quality score: length band + stopword ratio + mean word
    * length, combined with exact decimal weights so the score is
    * cross-engine deterministic.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    val nTok = size(w).cast(LongType)
    val nStop = size(filter(w, x => x.isin(stopwordsEn: _*))).cast(LongType)
    val sumLen = aggregate(transform(w, x => length(x).cast(LongType)), lit(0L), _ + _)
    // plain double division: integer operands are exact in double and IEEE
    // division is correctly rounded, so both engines produce the same bits.
    val stopRatio = nStop.cast(DoubleType) / nTok.cast(DoubleType)
    val meanWlen = sumLen.cast(DoubleType) / nTok.cast(DoubleType)
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      stopRatio.as("stopword_ratio"),
      meanWlen.as("mean_token_len"),
      // short docs and stopword-free docs are low quality
      (when(nTok < 20, lit(0.2)).otherwise(lit(1.0))
        * when(nStop === 0, lit(0.5)).otherwise(lit(1.0))).as("quality"))
  }

  /** Stopword-set language-ID heuristic. Scores each candidate language by
    * its marker-token hits and returns the argmax (ties break by fixed
    * language order). A real system would use char-n-gram profiles; the
    * *operator shape* — per-row array scoring, no shuffle — is the same.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"))

  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(w, x => x.isin(markers: _*))).cast(LongType)
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("score"),
          struct(sc.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    val outCols = col("doc_id") +:
      (scores.map { case (l, c) => c.as(s"score_$l") } :+
        best.getField("lang").as("lang_pred") :+
        best.getField("score").as("lang_score"))
    docs.select(outCols: _*)
  }

  /** GPT-2-style pre-tokenizer pattern: contraction suffixes, space-glued
    * letter runs, digit runs, punctuation runs, residual whitespace. Only
    * constructs with identical semantics in Java regex (Spark) and RE2
    * (DuckDB) — alternation, literal classes, `+`/`?` — so both engines
    * tokenize identically.
    */
  val bpePattern: String = "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ']+| +"

  /** BPE-ish token accounting: pre-tokenizer token count plus a
    * deterministic subword estimate (ceil(len/4) per pre-token — the
    * classic ~4-chars-per-BPE-token budget rule). A pure projection —
    * the regex runs once per row, no shuffle at any scale.
    */
  def bpeTokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = regexp_extract_all(col(textCol), lit(bpePattern), lit(0))
    docs.select(
      col("doc_id"),
      size(toks).cast(LongType).as("n_bpe_tokens"),
      aggregate(
        transform(toks, t => ceil(length(trim(t)).cast(DoubleType) / 4.0)),
        lit(0L), (acc, x) => acc + x).as("n_subword_est"))
  }

  /** Hashed-linear quality-classifier inference — the fastText-style
    * filtering pass pretraining pipelines run corpus-wide (CCNet's
    * fastText stage; GPT-3's quality LR): score = sigmoid(mean hashed
    * bag-of-words weight). The weight table is derived, not learned —
    * `w(i) = (i·2654435761 mod 1001) − 500` milli-units — so the gate is
    * deterministic and the SQL oracle reproduces it; swap `weightExpr`
    * for an `element_at` over a broadcast learned vector in production
    * (same plan shape: pure projection, zero shuffle at any corpus
    * size). All-integer accumulation; one double division chain + a
    * 6dp-rounded sigmoid at the end (cross-engine doctrine).
    */
  def classifierScore(docs: DataFrame, dim: Int = 1024,
      textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    def weight(t: Column): Column =
      pmod(wordHash(t), lit(dim.toLong)) * lit(2654435761L) % 1001L - 500L
    val raw = aggregate(w, lit(0L), (acc, t) => acc + weight(t))
    val logit = raw.cast(DoubleType) / lit(1000.0) / size(w).cast(DoubleType)
    docs.select(col("doc_id"), size(w).cast(LongType).as("n_tokens"),
      raw.as("raw_milli"),
      round(lit(1.0) / (lit(1.0) + exp(-logit)), 6).as("quality_prob"))
  }

  /** Order-sensitive rolling-hash fingerprint: fold words left-to-right as
    * acc = (acc * 31 + wordHash(w)) mod (2^31 - 1). Stays below 2^63 so
    * both engines compute it with plain BIGINT arithmetic.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    docs.select(
      col("doc_id"),
      aggregate(w, lit(0L),
        (acc, x) => (acc * 31L + wordHash(x)) % 2147483647L).as("fingerprint"))
  }

  /** Greedy sequence packing for training-shard assembly: documents
    * pack in id order into fixed token-budget bins, independently per
    * pack GROUP. The group is the distribution unit — groups pack in
    * parallel (one shuffle on the group key), documents within a group
    * sequentially in id order — the deterministic, machine-count-
    * independent policy reproducible training shards need. A document
    * larger than the budget gets a bin of its own (never split).
    *
    * Scale shape: groups bound both parallelism and per-task memory
    * (a group's (id, n_tokens) pairs — NOT its text — are held and
    * sorted in one task), so the caller sizes groups like file splits;
    * packing 100 TB means millions of groups, each a few thousand docs.
    *
    * Output: (doc_id, grp, bin, n_tokens), bins numbered from 0 per
    * group.
    */
  def packSequences(docs: DataFrame, budget: Long, groupExpr: Column,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val s = docs.sparkSession
    import s.implicits._
    docs.select(groupExpr.cast(LongType).as("grp"),
        col(idCol).cast(LongType).as("doc_id"),
        size(tokens(col(textCol))).cast(LongType).as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (grp, it) =>
        val sorted = it.toIndexedSeq.sortBy(_._2)
        var bin = 0L
        var used = 0L
        var first = true
        sorted.iterator.map { case (_, id, tok) =>
          if (first) { used = tok; first = false }
          else if (used + tok > budget) { bin += 1; used = tok }
          else used += tok
          (id, grp, bin, tok)
        }
      }
      .toDF("doc_id", "grp", "bin", "n_tokens")
  }
}
