package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All implemented as pure Column expressions (codegen-friendly, no UDFs) so
  * they run inside whole-stage codegen over a 100 TB `documents` scan and are
  * exactly reproducible in the DuckDB oracle.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Tokens, lowercased (the shingle/fingerprint base). */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Count of regexp matches (language-marker scoring helper). */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** GPT-2-style pre-tokenizer regex (contractions, letter runs, digit runs,
    * punctuation runs, whitespace runs) — the standard BPE *pre*-split. Each
    * match ≈ one-to-few BPE tokens, so the match count is the usual cheap
    * proxy for LLM token counts over a corpus (single codegen'd regexp pass;
    * no vocab shipped to executors).
    */
  val bpePretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token count (pre-tokenizer match count). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePretokenPattern), lit(0)))

  /** The pre-token pieces themselves (inspection / downstream BPE). */
  def bpePretokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePretokenPattern), lit(0))

  /** Stopword-marker language scores. Deliberately small marker sets — the
    * point is the scalable scoring shape (one regexp pass per language,
    * argmax), not lexical completeness.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|for|with)\\b",
    "de" -> "\\b(der|die|und|das|ist|nicht|mit|ein)\\b",
    "es" -> "\\b(el|la|de|los|que|es|por|con)\\b",
    "fr" -> "\\b(le|la|les|et|des|est|pour|dans)\\b")

  /** Heuristic language ID: argmax of marker counts, first-listed language
    * wins ties, "und" (undetermined) when no marker hits at all.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, pat) =>
      lang -> patternCount(lower(text), pat)
    }
    val best = greatest(scores.map(_._2): _*)
    val noHit = scores.map(_._2).reduce(_ + _) === 0
    scores.foldRight(lit("und")) { case ((lang, sc), els) =>
      when(!noHit && sc === best, lang).otherwise(els)
    }
  }

  /** Quality signals: punctuation ratio, uppercase ratio, mean token length.
    * Composite score in [0,1]-ish: long-enough docs with moderate
    * punctuation score high.
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  def upperCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[A-Z]", ""))

  def meanTokenLen(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      tokenCount(text)

  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / n
    val upperRatio = upperCount(text).cast("double") / n
    val lenScore = least(n / lit(500.0), lit(1.0))
    round(lenScore * (lit(1.0) - least(punctRatio * 5, lit(1.0))) *
      (lit(1.0) - least(upperRatio * 5, lit(1.0))), 5)
  }

  /** Deterministic document fingerprint: character-level polynomial rolling
    * hash mod 1e9+7 (stays in BIGINT range, so it's reproducible in any
    * engine — DuckDB overflow-checks BIGINT, Java wraps; the modulus keeps
    * both in the exact-integer domain).
    * Reference analogue: XXH64-based distinct hashing (`op_distinct.c:20-26`);
    * here the point is a portable content fingerprint for dedup.
    */
  def fingerprint(text: Column): Column =
    // native codegen'd fold (graft.plans.Fingerprint) — the composed
    // `aggregate(transform(split(text, "")...))` form is value-identical
    // but CodegenFallback: two interpreted lambda invocations per CHARACTER
    // per row (FingerprintSpec pins native ≡ composed incl. multi-byte /
    // astral / empty / NULL; the DuckDB oracle SQL is unchanged)
    org.apache.spark.sql.GraftColumn.column(
      graft.plans.Fingerprint(
        org.apache.spark.sql.GraftColumn.expression(text)))

  /** Full per-document feature set. */
  def docFeatures(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      length(col("text")).as("n_chars_m"),
      punctCount(col("text")).as("n_punct"),
      upperCount(col("text")).as("n_upper"),
      round(meanTokenLen(col("text")), 5).as("mean_token_len"),
      qualityScore(col("text")).as("quality"),
      langId(col("text")).as("lang_guess"),
      fingerprint(col("text")).as("fp"))
}
