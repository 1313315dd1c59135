package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [NORTH-STAR] Text-analysis operators for large-scale training-data
  * pipelines (BASELINE.json mandate; no reference counterpart — the
  * reference's text surface stops at JSON assembly, storedprocedure.sql:51).
  *
  * All operators are pure Column expressions over built-in / higher-order
  * functions — no UDFs — so they stay inside whole-stage codegen and
  * scale linearly with zero shuffles (per-row map work). At 100 TB these
  * run as a single scan stage; the only shuffle in the declared queries is
  * the final per-language aggregate.
  */
object TextOps {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-grams IN ORDER (duplicates kept); a text shorter than `n`
    * tokens is one whole-text gram. THE single n-gram definition —
    * Dedup.shingles distincts it for Jaccard sets, Curate.repetitionE4
    * counts its duplicates — so the dedup family, the repetition
    * signal, and their DuckDB oracles can never de-synchronize. */
  def ngrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Quality score: stopword-hit ratio scaled to 1e4 — THE single
    * formula behind llm_quality_score and llm_quota_lang. */
  def qualityE4(text: Column): Column =
    round(lit(10000.0) * stopwordHits(text) / size(tokens(text))).cast("long")

  /** BPE-ish subword segmentation: runs of letters, runs of digits, or a
    * single non-alphanumeric symbol — the classic pre-tokenizer regex. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Tiny per-language function-word lexicons for the n-gram/lexicon
    * language-ID heuristic. Deterministic, no model download. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"))

  /** Hits of one lexicon in the token array. */
  def lexiconHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language ID: CJK codepoints → zh, else argmax lexicon hits with a
    * fixed tie-break order (en > es > fr > de, matching `lexicons`). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = lexicons.map { case (l, ws) => (l, lexiconHits(toks, ws)) }
    val best = scored.tail.foldLeft((scored.head._2, lit(scored.head._1))) {
      case ((bestScore, bestLang), (l, s)) =>
        (greatest(bestScore, s),
          when(s > bestScore, lit(l)).otherwise(bestLang))
    }._2
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(best)
  }

  /** Punctuation character count (quality signal). */
  def punctChars(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Stopword hits across all lexicons (quality signal). */
  def stopwordHits(text: Column): Column =
    lexiconHits(tokens(text), lexicons.flatMap(_._2).distinct)

  /** Document fingerprint: md5 of the normalized text (lowercase,
    * whitespace collapsed) — the exact-dedup content key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Overlapping token-window chunking — the pre-training segmentation
    * step (context-window-sized pieces with `size - step` tokens of
    * overlap). Pure higher-order expression: one array of chunk strings
    * per document, exploded by the caller. */
  def chunks(text: Column, size: Int, step: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0),
        greatest(ceil((org.apache.spark.sql.functions.size(toks) - size)
          .cast("double") / step).cast("int"), lit(0))),
      i => concat_ws(" ", slice(toks, i * step + 1, lit(size))))
  }

  /** 52-bit rolling (polynomial) fingerprint over tokens, computed as a
    * left fold — order-sensitive, unlike the md5 content hash, so it
    * distinguishes permuted documents. Pure higher-order expression;
    * modulus keeps every intermediate < 2^58 so ANSI mode never sees a
    * long overflow. */
  def rollingHash(text: Column): Column = {
    val m = lit(1L << 52)
    aggregate(tokens(text), lit(982451653L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), m), m))
  }
}
