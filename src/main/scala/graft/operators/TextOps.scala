package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, and content
  * fingerprinting. Everything is built from codegen'd Catalyst
  * expressions (`split`, `regexp_*`, higher-order array functions) — no
  * UDFs — so the whole pipeline stays inside whole-stage codegen and
  * scales linearly with input splits; there is no shuffle in any of
  * these per-row operators.
  *
  * The reference has no text stack (its strings are codes/labels,
  * e.g. reference: src/GAMUTRawData/odmdata/variable.py:8-27); these are
  * the extension operators a 100 TB document pipeline needs.
  */
object TextOps {

  /** RE2's whitespace set, spelled explicitly: Java's `\\s` ALSO
    * matches vertical tab (\\x0B), which DuckDB's RE2 `\\s` does not —
    * a document containing one would tokenize differently on the two
    * engines. Every Spark-side tokenizer/normalizer uses this class so
    * both engines agree on ANY input, not just the current corpus.
    */
  val WsChars = " \\t\\n\\f\\r"
  val WsClass = s"[$WsChars]"

  /** 60-bit stable content hash both Spark and DuckDB can compute
    * identically: first 15 hex chars of md5, parsed base-16.
    * (DuckDB equivalent: `('0x' || substr(md5(x),1,15))::BIGINT`.)
    */
  def hash15(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Salted variant — one spelling of the `salt|value` convention, so
    * split buckets and samplers cannot drift on the prefix format.
    */
  def hash15(c: Column, salt: String): Column =
    hash15(concat(lit(salt), lit("|"), c))

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column =
    split(trim(text), WsClass + "+")

  /** BPE-ish subword pre-tokenization: letter runs, single digits,
    * single punctuation marks — the classic GPT-2 style splitter shape.
    */
  val BpePattern = s"[A-Za-z]+|[0-9]|[^A-Za-z0-9${WsChars}]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Whitespace-collapsed, lowercased, trimmed normal form used for
    * exact-dup hashing and fingerprinting.
    */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, WsClass + "+", " ")))

  /** Word n-gram shingles (n consecutive tokens joined by a space).
    * Documents with fewer than n tokens yield an empty array.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles from an ALREADY-MATERIALIZED token array column.
    *
    * Callers doing heavy shingling should `withColumn` the token array
    * first and pass the column reference: Catalyst does no common-
    * subexpression elimination inside higher-order-function lambdas, so
    * a `split(...)` expression passed here directly is re-evaluated for
    * every shingle index (observed 10×+ slowdown on minhash).
    *
    * 1-based element_at over a 1..size-n+1 sequence keeps the lambda
    * free of 0/1-index confusion and mirrors the DuckDB oracle's
    * list[i]. `sequence(1, x)` is DESCENDING for x<1, so clamp to 1 and
    * slice the result back to the true (possibly zero) length.
    * try_element_at: the clamped index probes past the array end on
    * short docs, and ANSI mode makes plain element_at throw there.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val m = size(toks) - (n - 1)
    val idx = sequence(lit(1), greatest(m, lit(1)))
    slice(
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(k => try_element_at(toks, i + k)): _*)),
      lit(1), greatest(m, lit(0)))
  }

  /** Character n-gram set (distinct) — basis of n-gram Jaccard.
    * (SQL `substring` accepts a column start position, which the Scala
    * DSL's `substring` does not — hence the expr form.)
    */
  def charNgrams(textCol: String, n: Int): Column =
    array_distinct(expr(
      s"""slice(
            transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)),
                      i -> substring($textCol, i, $n)),
            1, greatest(length($textCol) - ${n - 1}, 0))"""))

  /** Stopword markers per language for the n-gram/marker language-ID
    * heuristic. Small fixed sets — evaluated as integer hit counts so
    * the score is exact (no fp) and cheap.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "las", "una", "y"),
    "fr" -> Seq("le", "les", "et", "une", "est"))

  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(_.asInstanceOf[Any]): _*)))
      .cast("long")

  /** Argmax language with deterministic tiebreak: earlier entry in
    * [[LangMarkers]] wins ties (so all-zero → "en").
    */
  def langPred(scores: Seq[(String, Column)]): Column =
    scores.init.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, s), i), elseCol) =>
        val rest = scores.drop(i + 1).map(_._2)
        when(rest.foldLeft(lit(true): Column)((acc, o) => acc && s >= o),
          lit(lang)).otherwise(elseCol)
    }

  /** Rabin–Karp rolling hash of the character stream, mod 1e9+7 with
    * base 31 — each step stays far below 2^63 so arithmetic never
    * overflows. Used for winnowing-style fingerprints. Native
    * [[graft.functions.RollingHash]]: the composed `aggregate` fold
    * ran an interpreted lambda per character (spec'd equivalent in
    * VectorExprSpec).
    */
  def rollingHash(textCol: String): Column = expr(s"rolling_hash($textCol)")

  /** Distinct character-n-gram COUNT — the native one-pass equivalent
    * of `size(charNgrams(...))` ([[graft.functions.NgramDistinctCount]]):
    * no gram array, no interpreted lambda per gram slot. Use
    * [[charNgrams]] only where the gram SET itself is needed (d5's
    * Jaccard).
    */
  def distinctNgramCount(textCol: String, n: Int): Column =
    expr(s"ngram_distinct_count($textCol, $n)")
}
