package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline:
  * tokenization, shingling, fingerprinting, quality metrics, and a
  * marker-token language-ID heuristic. All pure `Column` expressions
  * (whole-stage-codegen friendly, no UDFs) and all reproducible in
  * ANSI-ish SQL for the DuckDB oracle.
  */
object Text {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles ("a b c" strings) from an ALREADY
    * MATERIALIZED token-array column. Empty array for docs shorter
    * than n tokens.
    *
    * Callers must project `tokens(text)` into a named column first
    * and pass that attribute: `ArrayTransform` is interpreted (no
    * codegen for HOF lambdas), so a `toks` that is itself the
    * `split(...)` EXPRESSION gets re-evaluated on every `element_at`
    * of every gram — measured ~14× slower at sf0.1 than indexing a
    * materialized array.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Distinct word n-gram shingles straight from a text column —
    * convenience for one-shot/small inputs. On data paths prefer a
    * `tokens(text)` projection + [[shinglesFromTokens]] (see its
    * performance note).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Adjacent word pairs WITH multiplicity (collocation counting
    * needs occurrences, not the distinct sets [[shinglesFromTokens]]
    * builds): array<struct<w1,w2>> via two slices zipped — no HOF
    * lambda, so nothing re-evaluates per element. Empty for docs
    * under 2 tokens.
    */
  def bigramsFromTokens(toks: Column): Column = {
    val m = greatest(size(toks) - lit(1), lit(0))
    arrays_zip(slice(toks, lit(1), m).as("w1"), slice(toks, lit(2), m).as("w2"))
  }

  /** Exact full-text fingerprint (md5 hex — exact-dup key). */
  def fingerprint(text: Column): Column = md5(text)

  /** Order-insensitive bag fingerprint: md5 over the sorted distinct
    * token set — catches shuffled/duplicated-token variants.
    */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Cheap LLM-token estimate: ceil(chars / 4) — the usual BPE
    * rule-of-thumb, exact integer arithmetic.
    */
  def estBpeTokens(nChars: Column): Column =
    ((nChars + lit(3)) / lit(4)).cast("long")

  /** BPE-ish regex token count: alphanumeric runs and single
    * punctuation marks each count as one token (the word-boundary
    * pre-split every BPE tokenizer applies before merges).
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Punctuation character count (non-alphanumeric, non-whitespace) —
    * the numerator of the punct-ratio quality signal.
    */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("long")

  /** Canonical text normalization for dedup robustness: lowercase,
    * punctuation → space, whitespace collapsed, trimmed. Pure
    * codegen'd regex expressions (ASCII subset shared by Java and
    * RE2 regex dialects, so the oracle matches byte-for-byte).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Deterministic hash bucket in [0, buckets) from any key column —
    * the train/val/test splitter every training pipeline needs: the
    * assignment is a pure function of the key (stable across runs,
    * machines and engines — md5-derived like the simhash token hash,
    * so the DuckDB oracle reproduces it bit-exactly), and adding data
    * never reshuffles existing assignments.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Count of tokens contained in `words`. */
  def markerHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*))).cast("long")

  val stopwords: Seq[String] = Seq("the", "a")

  /** Marker token lists per language for the language-ID heuristic.
    * The synthetic corpus has a closed 31-token vocabulary, so markers
    * are drawn from it; the mechanism (per-language token scoring +
    * deterministic argmax) is the real product.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "table", "row", "column"),
    "de" -> Seq("stream", "batch", "window", "group"),
    "fr" -> Seq("query", "join", "filter", "sort"))

  /** Deterministic argmax language: highest marker-hit count wins,
    * ties broken by list order (en > es > de > fr).
    */
  def langId(text: Column): Column = {
    val hits = langMarkers.map { case (lang, ws) => lang -> markerHits(text, ws) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
