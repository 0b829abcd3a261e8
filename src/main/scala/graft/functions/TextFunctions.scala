package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for text analysis over document corpora — the
  * LLM-training-data operators (language ID, quality scoring, token
  * counting, fingerprinting). Everything is built from codegen'd native
  * functions (regexp_*, length, md5) — zero UDFs, so the whole text
  * pipeline stays inside WholeStageCodegen and scales linearly with
  * input splits.
  */
object TextFunctions {

  /** Occurrences of `pattern` in `c` (regexp-count via extract_all). */
  def patternCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Whitespace-delimited token count. */
  def wsTokenCount(c: Column): Column = patternCount(c, "\\S+")

  /** BPE-ish pre-tokenizer count: alpha runs, single digits, single
    * punctuation marks — a deterministic proxy for subword token budgets.
    */
  def bpeIshTokenCount(c: Column): Column =
    patternCount(c, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")

  /** Per-language stopword hit counts (tiny disjoint marker sets). */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "fr" -> "\\b(le|les|et|des|une)\\b",
    "es" -> "\\b(el|los|las|que|una)\\b")

  /** CJK codepoint presence (zh marker). */
  val cjkPattern: String = "[\\x{4e00}-\\x{9fff}]"

  /** Normalized content for exact-dup fingerprinting: lowercase,
    * alphanumerics only.
    */
  def normalizedContent(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9]+", "")

  /** MD5 fingerprint of normalized content. */
  def fingerprint(c: Column): Column = md5(normalizedContent(c))
}
