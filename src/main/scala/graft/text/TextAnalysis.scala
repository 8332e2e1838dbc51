package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline: tokenization +
  * counting, quality scoring, language identification, fingerprinting.
  * All pure per-row column expressions (narrow, codegen'd, no shuffle) —
  * at 100 TB these run at scan speed and the only cost is CPU.
  */
object TextAnalysis {

  /** Whitespace tokens. The corpus contract (documents.text) is
    * single-space-separated tokens; `\\s+` tolerates real-world runs.
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Canonical text normalization — the pre-dedup cleanup every corpus
    * pass runs first (lowercase, strip non-alphanumerics, collapse
    * whitespace, trim) so that near-identical variants hash identically
    * downstream. The regexes deliberately stay inside the Java∩RE2
    * dialect intersection (same rule as [[redactPii]]): character
    * classes and `+` only, no lookarounds, no unicode properties — so an
    * external engine replays the normalization byte-for-byte.
    * Pure codegen'd per-row expression: runs at scan speed.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** BPE-ish subword token estimate: empirical ~4 chars/token for
    * English-like text, never below the whitespace word count.
    */
  def subwordTokenEstimate(text: Column): Column =
    greatest(ceil(length(text) / 4.0).cast(LongType), tokenCount(text).cast(LongType))

  /** Mean token length derived from char count (exact for the
    * single-space corpus contract).
    */
  def meanTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - 1)) / n.cast(DoubleType)
  }

  /** Type-token ratio: unique/total — a standard repetitiveness signal. */
  def typeTokenRatio(text: Column): Column =
    uniqueTokenCount(text) / tokenCount(text).cast(DoubleType)

  /** Fraction of tokens found in `vocab` (stopword ratio when `vocab` is a
    * stopword list; boilerplate ratio for boilerplate lists, etc.).
    */
  def vocabRatio(text: Column, vocab: Seq[String]): Column = {
    val hits = size(array_intersect(array_distinct(tokens(text)), array(vocab.map(lit): _*)))
    hits / tokenCount(text).cast(DoubleType)
  }

  /** Fraction of non [a-z0-9 space] characters — punctuation/noise ratio.
    * Empty documents score 0.0: under ANSI mode a plain `/` on a
    * zero-length text raises DIVIDE_BY_ZERO and one empty doc would abort
    * the whole corpus job (CASE WHEN evaluates branches lazily, so the
    * division never runs for the empty branch).
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", ""))) /
          length(text).cast(DoubleType))

  /** Composite quality score in [0,1]: long-enough, not too repetitive,
    * not punctuation-noise. Weights are heuristic; each signal is exposed
    * separately so pipelines can tune their own gate. Empty documents get
    * a deterministic 0.0 so quality gates filter them instead of aborting
    * (or worse, passing them on the strength of a vacuous TTR of 1.0).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text) / 100.0, lit(1.0))
    val ttr = typeTokenRatio(text)
    val noise = punctRatio(text)
    when(length(text) === 0, lit(0.0))
      .otherwise(round(lenScore * 0.4 + ttr * 0.4 + (lit(1.0) - noise) * 0.2, 6))
  }

  // -------------------------------------------------------------------
  // Language identification: marker-token scoring. Each language gets a
  // small high-frequency function-word list; score = fraction of distinct
  // marker hits; CJK is detected by codepoint class first (script beats
  // vocabulary). Returns "und" when nothing scores.
  // -------------------------------------------------------------------

  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ich", "ein", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "une", "dans", "que"))

  /** Language id from a *staged* distinct-lowercase-token column (PERF:
    * the token array is referenced once per language list — pass an
    * attribute, not an inline split).
    */
  def langIdFromTokens(text: Column, toks: Column): Column = {
    // CJK chars present → zh (script heuristic before vocabulary)
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    // argmax via array_max over (score, lang) structs: struct ordering is
    // field-by-field, so the max struct carries the winning language.
    val scored = array(langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(array_intersect(toks, array(markers.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(cjk, lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  def langId(text: Column): Column =
    langIdFromTokens(text, array_distinct(tokens(lower(text))))

  // -------------------------------------------------------------------
  // PII redaction
  // -------------------------------------------------------------------

  /** Redaction rules, applied in order (most-specific first: an email's
    * digits must not be half-eaten by the number rule). Patterns stick to
    * the regex subset RE2 and java.util.regex interpret identically
    * (char classes, bounded repetition, `\b`, `\d` — no lookaround, no
    * backrefs), so redaction replays in external engines verbatim.
    */
  val piiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\+\\d{7,15}" -> "<PHONE>",
    "\\b\\d{9,}\\b" -> "<NUM>")

  /** Scrub emails, IPv4s, international phone numbers and long digit runs
    * (ids, card numbers) from training text — a pure per-row codegen'd
    * regexp chain, no shuffle.
    */
  def redactPii(text: Column): Column =
    piiRules.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  // -------------------------------------------------------------------
  // Fingerprinting
  // -------------------------------------------------------------------

  /** Whole-document content fingerprint (normalized md5). */
  def docFingerprint(text: Column): Column = md5(to_binary(lower(text), lit("utf-8")))

  /** Token 3-gram shingles ("a b c" strings) from a *pre-materialized*
    * token array column. Documents with fewer than 3 tokens fall back to a
    * single whole-text shingle.
    *
    * PERF: higher-order functions are interpreted (CodegenFallback), so an
    * inline `split(...)` here would be re-evaluated on every `element_at`
    * access — O(tokens²) per row. Callers must stage `toks` as its own
    * projection column (a multi-referenced non-cheap producer, which
    * CollapseProject keeps materialized) and pass the attribute in.
    */
  def shinglesFromTokens(text: Column, toks: Column): Column = {
    val grams = graft.functions.NgramArray.ngrams(toks, 3)
    when(size(toks) >= 3, grams).otherwise(array(text))
  }

  /** Rolling-shingle fingerprint: the minimum md5 over all 3-gram shingles
    * — one deterministic representative per document, stable under small
    * edits away from the minimal shingle (the single-hash seed of
    * MinHash-style fingerprinting). `sh` must be a staged shingle column
    * (see [[shinglesFromTokens]]).
    */
  def shingleFingerprintFromShingles(sh: Column): Column =
    array_min(transform(sh, s => md5(to_binary(s, lit("utf-8")))))
}
