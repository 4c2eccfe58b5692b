package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID (stopword n-gram heuristic), quality scoring,
  * and document fingerprinting. Everything is built-in Catalyst expressions
  * (split/transform/aggregate/array_*) — no UDFs — so the whole pipeline
  * stays inside WholeStageCodegen and scales linearly with no shuffles
  * beyond what the caller adds.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty text → empty array (split would give
    * a single "" token). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Per-language stopword marker lists for the language-ID heuristic.
    * Deliberately small — the score is hits over distinct tokens. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), array(words.map(lit): _*)))

  /** Dataset-card statistics per source — the numbers a corpus release
    * ships with: document/token/char totals, average length, language
    * spread, empty-document count. ONE partial-aggregated shuffle on the
    * source column (bounded cardinality in any curation recipe); sums are
    * exact BIGINTs and the average is one double division rounded at the
    * end, so any engine reproduces the report bit-for-bit. */
  def corpusStats(
      docs: DataFrame,
      srcCol: String = "source",
      textCol: String = "text",
      langCol: String = "lang",
      charsCol: String = "n_chars"): DataFrame =
    docs.groupBy(col(srcCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
      sum(col(charsCol).cast("long")).as("total_chars"),
      round(sum(col(charsCol).cast("long")).cast("double") / count(lit(1)), 4)
        .as("avg_chars"),
      count_distinct(col(langCol)).as("distinct_langs"),
      sum(when(length(trim(col(textCol))) === 0, 1L).otherwise(0L)).as("n_empty"))

  /** Vocabulary build (tokenizer-training prep): global token frequencies
    * with ranks, thresholded at `minCount` and capped at `topK` — the table
    * a BPE/unigram tokenizer trainer consumes, and the basis for
    * frequency-based filtering rules.
    *
    * Scale shape: the corpus-sized work is the classic wordcount — explode
    * (narrow, codegen) into ONE partial-aggregated hash shuffle keyed by
    * the token, so 100 TB of text reduces map-side before anything moves.
    * The global rank window is inherently single-task (a total order), so
    * the rows reaching it MUST be bounded first — an enforced argument
    * contract, like [[graft.multimodal.Multimodal.imageNearDupPairs]]'s
    * recall bound: either a finite `topK` (applied BEFORE the window as a
    * distributed TakeOrderedAndProject, so the one-task sort sees at most
    * topK rows) or `minCount >= 2` (which caps the vocabulary at
    * ~1e5–1e7 rows for any natural-language corpus — the hapax cut).
    * `minCount = 1` with an unbounded topK would funnel the full
    * corpus-distinct term set through one task and refuses loudly. Rank
    * ties break on the token string so the table is
    * engine-reproducible. */
  def vocabulary(
      docs: DataFrame,
      textCol: String = "text",
      minCount: Long = 1L,
      topK: Int = Int.MaxValue): DataFrame = {
    require(topK != Int.MaxValue || minCount >= 2,
      "vocabulary(minCount = 1, topK = unbounded) would sort the full " +
        "corpus-distinct term set in a single task — pass a finite topK or " +
        "minCount >= 2 to bound the ranked vocabulary")
    val counts = docs
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("term_count"))
      .filter(col("term_count") >= minCount)
    // finite topK: cut to the global top-K BEFORE ranking — orderBy+limit
    // plans TakeOrderedAndProject (per-partition top-K, tiny driver merge),
    // so the single-task rank window below never sees more than topK rows
    val bounded =
      if (topK == Int.MaxValue) counts
      else counts.orderBy(col("term_count").desc, col("term")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("term_count").desc, col("term"))
    bounded.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** Out-of-vocabulary report against a vocabulary table (the companion
    * health metric to [[vocabulary]]: how much of each source a tokenizer
    * trained on that vocab would cover). Per group: total tokens, OOV
    * tokens, and the rounded OOV rate.
    *
    * Scale shape: explode → LEFT ANTI-style membership via a broadcast of
    * the vocabulary (bounded by construction — it came out of a minCount/
    * topK cap) → one partial-agged shuffle on the group column. The corpus
    * never shuffles on the token. */
  def oovReport(
      docs: DataFrame,
      vocab: DataFrame,
      groupCol: String = "source",
      textCol: String = "text",
      termCol: String = "term"): DataFrame = {
    val toks = docs.select(col(groupCol), explode(tokens(col(textCol))).as("__tok"))
    val v = vocab.select(col(termCol).as("__tok"), lit(1).as("__in_vocab"))
    toks.join(broadcast(v), Seq("__tok"), "left")
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("total_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        round(col("oov_tokens").cast("double") /
          greatest(col("total_tokens"), lit(1L)), 6))
  }

  /** Predicted language: argmax of stopword hits (first language wins ties,
    * in declaration order); no hits at all → "und". */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.map { case (l, ws) => (l, hits(toks, ws)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  // quality-score ingredients (each also exposed for the oracle)
  def charCount(text: Column): Column = length(text)
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[!?.,;:]", ""))) /
      greatest(length(text), lit(1))
  def stopwordRatio(text: Column): Column =
    hits(tokens(text), stopwords.head._2).cast("double") /
      greatest(size(array_distinct(tokens(text))), lit(1))

  /** Composite quality score in [0,1]: length saturation, stopword
    * presence, low punctuation density (shape mirrors the heuristics used
    * in public web-corpus pipelines, e.g. C4/Gopher-style rules). */
  def qualityScore(text: Column): Column =
    round(
      least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.4 +
        stopwordRatio(text) * 0.3 +
        (lit(1.0) - punctRatio(text)) * 0.3,
      6)

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set. Identical token bags → identical fingerprint, robust to
    * shuffled word order (cheap near-dup precursor). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Order-SENSITIVE rolling fingerprint: a 64-bit hash chained token by
    * token (h_i = xxhash64(h_{i-1}, tok_i)) — the streaming-safe analogue of
    * a Karp-Rabin rolling hash, built from overflow-safe hash chaining
    * (raw `acc*31+x` would trip ANSI overflow checks). */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** BPE-ish token-count estimate: whitespace words contribute
    * ceil(len/4) subword pieces (min 1), punctuation marks count as one
    * piece each — a deterministic, tokenizer-free proxy for LLM token
    * budgeting at corpus scale. */
  def bpeTokenCount(text: Column): Column =
    coalesce(
      aggregate(tokens(text), lit(0L),
        (acc, w) => acc + greatest(lit(1L), ceil(length(w) / 4.0).cast("long"))),
      lit(0L)) +
      coalesce(regexp_count(text, lit("[^\\w\\s]")), lit(0L))

  /** PII patterns for corpus redaction. Deliberately restricted to
    * constructs (character classes + greedy quantifiers, \b anchors) whose
    * match semantics agree between backtracking (Java) and leftmost-longest
    * (RE2-family) engines, so redaction is reproducible anywhere. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("card", "\\b\\d{16}\\b", "<CARD>"))

  /** Redact PII in place (codegen'd regexp_replace chain — one pass per
    * pattern, no UDFs, no shuffle). */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-pattern match counts (for redaction audit reports). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, pat, _) =>
      s"${name}_count" -> size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    }

  /** Word-bigram array ("w1 w2" strings); < 2 tokens → empty. The token
    * array is let-bound (transform over a single-element array) so the
    * tokenizer's regex split runs ONCE per doc — see [[graft.dedup.Dedup.shingles]]
    * for why the naive shape is quadratic. */
  def bigrams(text: Column): Column =
    element_at(
      transform(array(tokens(text)), t =>
        when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Gopher-style repetition signals per document: duplicate-token
    * fraction, duplicate-bigram fraction, and the share of all bigrams
    * taken by the single most frequent one — the standard "natural text
    * vs degenerate repetition" filters for web-corpus curation.
    *
    * Scale shape: token-level stats are a narrow codegen'd projection;
    * the per-doc bigram mode is explode + two hash aggregations keyed on
    * (doc, bigram) then (doc) — map-side partials absorb the repetition
    * itself (the more repetitive a doc, the FEWER distinct keys it
    * shuffles), so a pathological 10M-token one-word doc costs one
    * shuffled row, not 10M. No O(len²) per-row HOF scans anywhere. */
  def repetitionSignals(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      dupTokenThreshold: Double = 0.5,
      topBigramThreshold: Double = 0.1): DataFrame = {
    val tokStats = docs.select(col(idCol),
      element_at(transform(array(tokens(col(textCol))), t =>
        struct(size(t).as("n"), size(array_distinct(t)).as("nd"))), 1).as("ts"))
      .select(col(idCol), col("ts.n").as("token_count"), col("ts.nd").as("__nd"))
    val perBigram = docs
      .select(col(idCol), explode(bigrams(col(textCol))).as("b"))
      .groupBy(idCol, "b").agg(count(lit(1)).as("c"))
    val bigramStats = perBigram.groupBy(idCol)
      .agg(sum("c").as("__btot"), max("c").as("__btop"), count(lit(1)).as("__bnd"))
    tokStats.join(bigramStats, Seq(idCol), "left")
      .withColumn("__dtf", when(col("token_count") === 0, lit(0.0))
        .otherwise(lit(1.0) -
          col("__nd").cast("double") / col("token_count").cast("double")))
      .withColumn("__tbf", when(col("__btot").isNull, lit(0.0))
        .otherwise(col("__btop").cast("double") / col("__btot").cast("double")))
      .select(col(idCol),
        col("token_count"),
        round(col("__dtf"), 6).as("dup_token_fraction"),
        coalesce(col("__btop"), lit(0L)).as("top_bigram_count"),
        when(col("__btot").isNull, lit(0.0))
          .otherwise(round(lit(1.0) -
            col("__bnd").cast("double") / col("__btot").cast("double"), 6))
          .as("dup_bigram_fraction"),
        round(col("__tbf"), 6).as("top_bigram_fraction"),
        (col("__dtf") > dupTokenThreshold || col("__tbf") > topBigramThreshold)
          .as("is_repetitive"))
  }

  /** Bigram (head, next) struct pairs of a document as an array column;
    * the token array is let-bound so the tokenizer runs once per doc. */
  def bigramPairs(text: Column): Column =
    element_at(transform(array(tokens(text)), t =>
      when(size(t) >= 2, transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))), 1)

  /** Corpus-level bigram statistics — the n-gram-LM view of a corpus:
    * for every head word, its continuation count, continuation diversity,
    * and the most frequent next word (ties broken lexicographically, so
    * the result is deterministic). The whole computation is two hash
    * aggregations (map-side partials on the heavy (head, next) key) plus
    * a per-head top-1 — expressed as row_number over (count DESC, next),
    * which Spark ≥3.5 executes with partial WindowGroupLimits, so no
    * head's full continuation list ever sits in one task's memory. */
  def bigramStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minHeadCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs.select(explode(bigramPairs(col(textCol))).as("p"))
      .select(col("p.w1").as("head"), col("p.w2").as("next"))
    val pairCounts = pairs.groupBy("head", "next").agg(count(lit(1)).as("c"))
    val headStats = pairCounts.groupBy("head")
      .agg(sum("c").as("head_count"), count(lit(1)).as("distinct_next"))
    val w = Window.partitionBy("head").orderBy(col("c").desc, col("next"))
    val top = pairCounts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("head"), col("next").as("top_next"), col("c").as("top_next_count"))
    headStats.filter(col("head_count") >= minHeadCount).join(top, "head")
  }

  /** CCNet-style language-model quality scoring: each document's
    * perplexity under the corpus's own add-one-smoothed bigram model,
    * P(next|head) = (c+1) / (total_head + V). Low-perplexity docs read
    * like the corpus; high-perplexity docs are the quality-filter outliers.
    *
    * Cross-engine determinism: each bigram's log-probability is rounded
    * to a fixed 1e-9 grid and scaled to a BIGINT, so per-doc sums are
    * exact integer arithmetic — no float-summation order sensitivity
    * anywhere (the `nll_scaled` column is bit-exact across engines; only
    * the final display perplexity touches floats, rounded to 4dp).
    *
    * Scale shape: three hash aggregations with map-side partials — per-doc
    * bigram multiplicities on (doc, head, next), corpus counts on (head,
    * next), head totals on (head); repetitive docs collapse BEFORE the
    * corpus-level shuffles. The vocabulary size joins in as a broadcast
    * single row. A web-corpus hot bigram ("of the") skews the score join's
    * build side only — AQE's skew-join split bounds it. */
  def perplexity(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val docPairs = docs
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("p"))
      .groupBy(col(idCol), col("p.w1").as("head"), col("p.w2").as("next"))
      .agg(count(lit(1)).as("__m"))
    val pairCounts = docPairs.groupBy("head", "next").agg(sum("__m").as("__c"))
    val headTotals = pairCounts.groupBy("head").agg(sum("__c").as("__total"))
    val vocab = docs.select(explode(tokens(col(textCol))).as("w"))
      .agg(countDistinct("w").as("__V"))
    val scored = docPairs
      .join(pairCounts, Seq("head", "next"))
      .join(headTotals, Seq("head"))
      .crossJoin(broadcast(vocab))
      .withColumn("__lp",
        round(log((col("__c") + 1).cast("double") /
          (col("__total") + col("__V")).cast("double")) * 1e9, 0).cast("long"))
    val perDoc = scored.groupBy(idCol).agg(
      sum(col("__m")).as("n_bigrams"),
      sum(col("__m") * col("__lp")).as("__slp"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(-col("__slp"), lit(0L)).as("nll_scaled"),
        when(col("n_bigrams").isNull, lit(null).cast("double"))
          .otherwise(round(
            exp(-col("__slp").cast("double") / (col("n_bigrams") * lit(1e9))),
            4)).as("perplexity"))
  }

  /** CCNet perplexity tiering (Wenzek et al. 2020 — the CCNet pipeline's
    * head/middle/tail split): per LANGUAGE, documents rank by LM
    * perplexity and cut into thirds — "head" is the cleanest slice a
    * pretraining mix keeps wholesale, "tail" is dropped or aggressively
    * filtered. The rank key is nll_scaled / n_bigrams in DOUBLE: both
    * operands are exact integers (see [[perplexity]]) and IEEE division
    * is correctly rounded, so the total order is engine-portable with no
    * epsilon games — exp() never enters the ordering. Bigram-less docs
    * key at 1e308 (deterministic tail placement on any engine; NULL
    * ordering defaults differ across engines, a literal does not).
    *
    * The OUTPUT key column is `ppl_key_milli` = nll_scaled*1000 div
    * n_bigrams in BIGINT arithmetic (≤ ~2.4e14, well inside int64) —
    * exact on any engine. A double rounded to 6 decimals at ~3.4e9
    * magnitude sits at the ulp boundary (ulp ≈ 4.8e-7), where
    * HALF_UP-on-shortest-decimal engines disagree with float-path
    * rounders in the last digit; integer milli-units side-step that
    * entirely. Bigram-less docs emit NULL (they carry no key).
    *
    * Plan shape: the LM statistics reuse [[perplexity]]'s partial-agged
    * shuffles; the tier assignment is ONE window over the per-language
    * exchange (ntile), no global sort. */
  def perplexityTiers(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val px = perplexity(docs, idCol, textCol)
    val key = when(col("n_bigrams") === 0, lit(1e308))
      .otherwise(col("nll_scaled").cast("double") / col("n_bigrams"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("__key"), col(idCol))
    docs.select(col(idCol), col(langCol)).join(px, Seq(idCol))
      .withColumn("__key", key)
      .withColumn("tier_idx", ntile(3).over(w).cast("int"))
      .withColumn("tier",
        element_at(array(lit("head"), lit("middle"), lit("tail")), col("tier_idx")))
      .select(col(idCol), col(langCol), col("n_bigrams"),
        when(col("n_bigrams") === 0, lit(null).cast("long"))
          .otherwise(expr("nll_scaled * 1000L div n_bigrams"))
          .as("ppl_key_milli"),
        col("tier_idx"), col("tier"))
  }

  /** BM25 top-k lexical retrieval (Robertson–Spärck Jones; the sparse
    * counterpart of the embedding-ANN family, and the classic source of
    * LEXICAL hard negatives for retrieval training — BM25-mined negatives
    * are the standard DPR/ColBERT recipe). Okapi BM25 with the usual
    * k1/b defaults; per-(query, doc, term) partial scores round to
    * integer MICRO-units before the per-doc sum, so the aggregation is
    * exact and engine-portable regardless of float fold order (the same
    * discipline as the DSIR scorer).
    *
    * Plan shape at scale: postings = one (doc, term) partial-agged
    * shuffle (the inverted index — inherent), carrying the document
    * length so no corpus-sized doc_id join follows; the query side is
    * DISTINCT terms and BROADCASTS, and it filters the postings FIRST —
    * only query-term postings ever leave the index scan. Document
    * frequencies are computed for QUERY TERMS ONLY (the same broadcast
    * semi-filter below the term-level count), yielding a ≤|query terms|
    * frame that itself broadcasts — the corpus never shuffles on the
    * Zipf-skewed term key. Catalyst reuses the single postings exchange
    * across the candidate and df branches. Top-k is a window over each
    * query's candidate set only. The corpus-level (N, total length) pair
    * is a 1-row aggregate collected to the driver and folded into the
    * score expression as literals. */
  def bm25TopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dt = postingsOf(corpus, idCol, textCol)
    val (n, total) = corpusLenStats(corpus, textCol)
    val qe = queryTerms(queries, idCol, textCol)
    // df for QUERY TERMS ONLY: the broadcast semi-filter sits below the
    // term-level count, so the Zipf-skewed full-vocabulary aggregate never
    // runs; the result is ≤ |distinct query terms| rows and broadcasts.
    val dfQ = dt.join(broadcast(qe.select("term").distinct()), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    okapiTopK(dt, qe, dfQ, n, total, k, k1, b)
  }

  /** Postings frame for one document set: (doc_id, len, term, tf). The
    * document length rides on every posting so scoring never joins a
    * corpus-sized doc table. */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("len"),
        explode(col("tk")).as("term"))
      .groupBy("doc_id", "term", "len").agg(count(lit(1)).as("tf"))

  /** (doc count, total token length) — a 1-row aggregate. Token-less docs
    * count toward N (they are part of the collection BM25 ranks over). */
  private def corpusLenStats(docs: DataFrame, textCol: String): (Long, Long) = {
    val r = docs.select(tokens(col(textCol)).as("tk"))
      .agg(count(lit(1)), coalesce(sum(size(col("tk")).cast("long")), lit(0L)))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  private def queryTerms(queries: DataFrame, idCol: String, textCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))

  /** Shared Okapi scorer over a postings frame: per-(doc, term) partial
    * scores in integer MICRO-units (exact, fold-order-free), broadcast
    * query/df joins, per-query top-k window.
    *
    * The micro-unit partial score depends only on (doc, term) — (tf, len,
    * df) carry no query variable — so it is computed ONCE per posting
    * BEFORE the query-membership join (r14: it used to be evaluated per
    * (query, doc, term) joined row; with full-document queries over a
    * Zipfy vocabulary that join fans each posting out to most queries, so
    * the log()/division ran tens of times per posting and the blown-up
    * rows carried (tf, len, df) they no longer needed). Values and sums
    * are bit-identical: same floor/rounding per (doc, term), same
    * integer addition order-freedom. */
  private def okapiTopK(
      dt: DataFrame, qe: DataFrame, dfQ: DataFrame,
      n: Long, total: Long, k: Int, k1: Double, b: Double): DataFrame = {
    val avg = total.toDouble / n // IEEE division: identical in any engine
    val idf = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val tfn = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avg))
    val micro = floor(idf * tfn * 1e6 + 0.5).cast("long")
    val scored = dt.join(broadcast(dfQ), "term")
      .select(col("term"), col("doc_id"), micro.as("micro"))
    val sc = scored.join(broadcast(qe), "term")
      .groupBy("query_id", "doc_id")
      .agg(round(sum("micro") / 1e6, 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    sc.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** Persisted BM25 inverted index as a graft lake table — the lexical
    * counterpart of [[graft.similarity.Similarity.buildIvfIndex]], and
    * the incremental-corpus shape of the fingerprint/shingle dedup
    * indexes: the corpus is tokenized ONCE at build, each new batch
    * appends its own postings without re-tokenizing anything, and
    * queries probe the index only.
    *
    * Layout: one row per (doc, term) posting carrying the document
    * length, PARTITIONED by `bucket = pmod(hash(term), buckets)` — a
    * query's terms resolve to their buckets and the scan reads only
    * those partitions' files (partition pruning), so search IO is
    * O(matching buckets), never a corpus or full-index scan. Corpus
    * stats (doc count, total token length) live in table properties,
    * updated transactionally with each batch; document frequencies are
    * computed AT QUERY TIME from the already-pruned probe — a term's
    * postings live wholly inside its bucket, so the pruned df equals
    * the full-corpus df, and a materialized df table would need a MERGE
    * per batch while saving nothing the probe has not already read. */
  def buildBm25Index(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 64,
      dfCap: Long = Long.MaxValue): graft.table.LakeTable = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    require(dfCap > 0, s"need dfCap > 0, got $dfCap")
    val post = postingsOf(corpus, idCol, textCol)
      .withColumn("bucket", pmod(hash(col("term")), lit(buckets)))
    // df-cap (stopword pruning at build): Zipf-head terms dominate postings
    // volume but contribute near-zero IDF — terms whose BUILD-corpus df
    // exceeds the cap are dropped from the index and FROZEN into the
    // capped-term list (table property), so appended batches drop the same
    // terms and search stays score-identical to an oracle that excludes
    // them. The list is the Zipf head — small by construction at any sane
    // cap — and frozen-at-build is the standard stopword-list contract
    // (a term crossing the cap later is not retroactively capped). Document
    // LENGTHS keep counting capped tokens, so the stats properties are
    // cap-independent and the append path never needs the capped set to
    // advance them. Storage tradeoff, made deliberately: the list rides
    // table properties — it follows CLONE/RESTORE and every reader sees it
    // transactionally — at the cost of re-serializing inside each append's
    // Metadata action (which the stats delta re-emits anyway); the
    // 10k-term guard below bounds that amplification to ~100 KB/commit
    // worst-case, and a real stopword head is 10-100x smaller.
    val capped: Seq[String] =
      if (dfCap == Long.MaxValue) Nil
      else {
        val c = post.groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") > dfCap).select("term")
          .collect().map(_.getString(0)).toSeq.sorted
        require(c.size <= 10000,
          s"dfCap=$dfCap caps ${c.size} terms — a cap this low prunes the " +
            "vocabulary body, not the Zipf head; raise it")
        c
      }
    val kept = if (capped.isEmpty) post else post.filter(!col("term").isin(capped: _*))
    val (n, total) = corpusLenStats(corpus, textCol)
    val t = graft.table.LakeTable.create(spark, dir, post.schema,
      partitionColumns = Seq("bucket"),
      properties = Map(
        "graft.bm25.buckets" -> buckets.toString,
        "graft.bm25.numDocs" -> n.toString,
        "graft.bm25.totalLen" -> total.toString) ++
        (if (capped.isEmpty) Map.empty[String, String]
         else Map(
           "graft.bm25.dfCap" -> dfCap.toString,
           // whitespace-joined is unambiguous: tokens come from a \s+ split
           "graft.bm25.cappedTerms" -> capped.mkString(" "))),
      ifNotExists = false)
    t.append(kept)
    t
  }

  /** Capped-term list frozen at [[buildBm25Index]] time (empty without a
    * df-cap). */
  private def cappedTerms(props: Map[String, String]): Seq[String] =
    props.get("graft.bm25.cappedTerms").toSeq
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)

  /** Append a new document batch to a [[buildBm25Index]] table: only the
    * BATCH tokenizes; its postings land in the same hash buckets (the
    * stored bucket count pins the layout), capped terms are dropped, and
    * the corpus stats advance — all in ONE commit
    * ([[graft.table.LakeTable.appendWithProps]]), so no reader ever sees
    * postings without their stats and a crash can never tear them. The
    * stats delta is recomputed from the FRESH snapshot inside the CAS
    * retry loop, so two concurrent appends both land with correct totals.
    *
    * `batchId` (optional) makes the append idempotent: a replay with the
    * same id is a full no-op — postings never duplicate and stats never
    * double-advance. This is the handle the streaming ingest
    * ([[graft.streaming.StreamIngest.startBm25Ingest]]) keys by epoch. */
  def appendBm25Batch(
      index: graft.table.LakeTable,
      batch: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      batchId: Option[String] = None,
      batchVersion: Long = 0L): Unit = {
    val props = index.properties
    val buckets = props("graft.bm25.buckets").toInt
    val capped = cappedTerms(props)
    val post0 = postingsOf(batch, idCol, textCol)
      .withColumn("bucket", pmod(hash(col("term")), lit(buckets)))
    val post = if (capped.isEmpty) post0 else post0.filter(!col("term").isin(capped: _*))
    val (n, total) = corpusLenStats(batch, textCol)
    index.appendWithProps(post,
      s => Map(
        "graft.bm25.numDocs" ->
          (s.metadata.properties("graft.bm25.numDocs").toLong + n).toString,
        "graft.bm25.totalLen" ->
          (s.metadata.properties("graft.bm25.totalLen").toLong + total).toString),
      txnAppId = batchId.map(id => s"graft.bm25.$id"),
      txnVersion = batchId.map(_ => batchVersion)): Unit
  }

  /** Search a [[buildBm25Index]] table: query terms hash to their buckets
    * (a bounded driver-side list, like the IVF probed-cell collect), the
    * postings scan prunes to those partitions, df aggregates over the
    * pruned probe, and the shared micro-unit Okapi scorer ranks. Scores
    * are identical to [[bm25TopK]] over the same logical corpus. */
  def bm25SearchIndex(
      index: graft.table.LakeTable,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val props = index.properties
    val n = props("graft.bm25.numDocs").toLong
    val total = props("graft.bm25.totalLen").toLong
    val buckets = props("graft.bm25.buckets").toInt
    // No persist: qe is evaluated three times (probed-bucket collect, df
    // semi-filter, scorer join) but it is broadcast-sized by contract —
    // re-tokenizing a query batch is cheaper than pinning cached partitions
    // in the block manager for the session's lifetime (a retrieval service
    // calling this per request would accumulate them unboundedly).
    val qe = queryTerms(queries, idCol, textCol)
    val probed = qe.select(pmod(hash(col("term")), lit(buckets)).as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val post = index.toDf.filter(col("bucket").isin(probed: _*))
      .select(col("doc_id"), col("term"), col("tf"), col("len"))
    val dfQ = post.join(broadcast(qe.select("term").distinct()), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    okapiTopK(post, qe, dfQ, n, total, k, k1, b)
  }

  /** Fixed-width character chunking with overlap — the document→context
    * splitting step of a training/RAG pipeline. Each document yields
    * `max(1, ceil((len − overlap) / stride))` chunks (stride = chunkChars −
    * overlapChars), starting at `chunk_id * stride`, each `chunkChars` wide
    * except a shorter tail; consecutive chunks share `overlapChars`
    * characters. A document no longer than `overlapChars` still yields its
    * single (whole-text) chunk, so no text is ever dropped.
    *
    * Plan shape: sequence + explode inside one codegen stage — narrow (no
    * shuffle, no UDF); output size is input chars × (1 + overlap/stride),
    * linear at any corpus size. Arithmetic is integer-exact so an external
    * oracle replays the assignment verbatim.
    */
  def chunkDocs(
      docs: DataFrame,
      chunkChars: Int,
      overlapChars: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(overlapChars >= 0 && chunkChars > overlapChars,
      s"need 0 <= overlap < chunk, got chunk=$chunkChars overlap=$overlapChars")
    val stride = chunkChars - overlapChars
    val len = coalesce(length(col(textCol)), lit(0))
    val n = greatest(lit(1),
      ceil((len - lit(overlapChars)).cast("double") / lit(stride.toDouble)).cast("int"))
    docs
      .withColumn("chunk_id", explode(sequence(lit(0), n - lit(1))))
      .withColumn("chunk_start", (col("chunk_id") * stride).cast("long"))
      .withColumn("chunk_text",
        col(textCol).substr(col("chunk_id") * stride + lit(1), lit(chunkChars)))
  }

  /** One-pass text-analysis projection over a documents table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("token_count", tokenCount(t))
      .withColumn("char_count", charCount(t))
      .withColumn("predicted_lang", langId(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
