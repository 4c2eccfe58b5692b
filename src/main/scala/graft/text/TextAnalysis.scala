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
