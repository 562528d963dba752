package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, all built from
  * codegen'd Spark built-ins (no UDFs): tokenization, token counting,
  * quality scoring, stopword-based language ID, fingerprinting.
  *
  * Every function here has an exactly-equivalent ANSI-SQL formulation used
  * by the DuckDB oracle in [[graft.SparkEntry.oracleSql]]; arithmetic is
  * ordered identically so doubles match bit-for-bit.
  */
object TextOps {

  /** Whitespace tokenization of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: alnum runs + individual punctuation marks over
    * NORMALIZED (lowercased) text — the character classes are lowercase, so
    * matching raw text would count every capital letter as punctuation.
    * (A real BPE needs a vocab; this regex is the standard pre-tokenizer.)
    */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(normalized(c), lit("[a-z0-9]+|[^a-z0-9\\s]"))

  def punctCount(c: Column): Column =
    regexp_count(normalized(c), lit("[^a-z0-9\\s]"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Tiny per-language stopword lists (public, standard closed-class words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "est"),
  )

  def stopwordCount(c: Column, lang: String = "en"): Column =
    hitCount(tokens(normalized(c)), stopwords(lang))

  def stopwordRatio(c: Column, lang: String = "en"): Column =
    stopwordCount(c, lang).cast("double") / tokenCount(c).cast("double")

  def avgWordLen(c: Column): Column = {
    val toks = tokens(c)
    aggregate(toks, lit(0.0), (acc, t) => acc + length(t).cast("double")) /
      size(toks).cast("double")
  }

  /** Heuristic quality score in [0,1]: rewards reasonable length, some
    * stopword density, and low punctuation density. Weights are fixed; the
    * arithmetic order matches the SQL oracle exactly.
    */
  def qualityScore(c: Column): Column = {
    val nTok   = tokenCount(c).cast("double")
    val lenTerm = least(nTok / lit(100.0), lit(1.0))
    val swTerm  = least(stopwordRatio(c, "en") * lit(5.0), lit(1.0))
    val pRatio  = punctCount(c).cast("double") / greatest(nTok, lit(1.0))
    val pTerm   = greatest(lit(1.0) - pRatio * lit(2.0), lit(0.0))
    lenTerm * lit(0.4) + swTerm * lit(0.3) + pTerm * lit(0.3)
  }

  /** Stopword-vote language ID over {en,de,es,fr} + CJK-codepoint check for
    * zh. Ties break in fixed order en > de > es > fr (a deterministic
    * function, matched by the oracle's CASE chain).
    */
  def langId(c: Column): Column = langIdFromTokens(tokens(normalized(c)), c)

  /** As [[langId]] over an already-projected normalized-token column —
    * prefer in query pipelines so the normalize+split runs once per row
    * instead of once per stopword-list probe (HOF lambdas are outside CSE).
    */
  def langIdFromTokens(toks: Column, raw: Column): Column = {
    val en = hitCount(toks, stopwords("en"))
    val de = hitCount(toks, stopwords("de"))
    val es = hitCount(toks, stopwords("es"))
    val fr = hitCount(toks, stopwords("fr"))
    when(regexp_count(raw, lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Word n-grams WITH multiplicity (one per position, unlike the distinct
    * [[wordShinglesFromTokens]] set) — repetition analysis needs occurrence
    * counts. Docs shorter than n degrade to one whole-doc gram.
    */
  def wordGramsWithRepeats(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** Per-row gram-repetition statistics in ONE narrow pass — the kernel of
    * the Gopher/MassiveText repetition filters (Rae et al. 2021, table A1):
    * sort the gram array, then a single `aggregate` walk over the sorted
    * runs yields
    *   - `top_count` / `top_gram`: the most frequent gram (ties break to
    *     the lexicographically smallest, for free: ascending order means
    *     the smallest gram reaches any given count first and later equal
    *     counts never displace it),
    *   - `dup_chars`: total characters across ALL occurrences of grams
    *     appearing ≥ 2 times,
    *   - `total_chars`: characters across all gram occurrences (the
    *     denominator that keeps the fractions in [0,1]).
    * O(m log m) per row, zero shuffles, codegen'd built-ins only — at
    * corpus scale this is a pure map stage.
    *
    * This HOF fold is the REFERENCE TWIN: the registry queries run the
    * native [[TextFingerprints.gramRunStats]] kernel (one static call per
    * row — the fold's lambda evaluates interpreted, one struct per
    * element, which costs ~0.6 s per fold at sf0.1 and q74 runs seven).
    * Field-for-field equivalence is asserted in GramRunStatsKernelSpec.
    */
  def gramRunStats(grams: Column): Column =
    aggregate(
      array_sort(grams),
      struct(
        lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("top_count"), lit("").as("top_gram"),
        lit(0L).as("dup_chars"), lit(0L).as("total_chars")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        val xLen = length(x).cast("long")
        struct(
          x.as("prev"),
          run.as("run"),
          when(run > acc.getField("top_count"), run)
            .otherwise(acc.getField("top_count")).as("top_count"),
          when(run > acc.getField("top_count"), x)
            .otherwise(acc.getField("top_gram")).as("top_gram"),
          (acc.getField("dup_chars") +
            when(run === 2L, xLen * 2L) // run hits 2: both occurrences count
              .when(run > 2L, xLen)
              .otherwise(lit(0L))).as("dup_chars"),
          (acc.getField("total_chars") + xLen).as("total_chars"))
      })

  /** Sorted-runs statistics over STRUCTURAL units (lines, paragraphs) for
    * the Gopher duplicate-line/-paragraph rules: same single-pass sorted
    * walk as [[gramRunStats]], but tracking duplicate OCCURRENCES too
    * (the line-fraction rules are occurrence-weighted: a line appearing
    * c ≥ 2 times contributes all c occurrences).
    * Returns struct(dup_occ, dup_chars, total_chars); total occurrences is
    * just `size(units)`, computed free at the call site.
    */
  def unitRunStats(units: Column): Column =
    aggregate(
      array_sort(units),
      struct(
        lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("dup_occ"), lit(0L).as("dup_chars"),
        lit(0L).as("total_chars")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        val xLen = length(x).cast("long")
        struct(
          x.as("prev"),
          run.as("run"),
          (acc.getField("dup_occ") +
            when(run === 2L, lit(2L)).when(run > 2L, lit(1L))
              .otherwise(lit(0L))).as("dup_occ"),
          (acc.getField("dup_chars") +
            when(run === 2L, xLen * 2L).when(run > 2L, xLen)
              .otherwise(lit(0L))).as("dup_chars"),
          (acc.getField("total_chars") + xLen).as("total_chars"))
      })

  /** Paragraphs: blank-line-separated blocks (a document without blank
    * lines is one paragraph).
    */
  def paragraphs(c: Column): Column = split(c, "\n\n", -1)

  /** Normalization for fingerprinting: lowercase, trim, collapse runs of
    * whitespace to single spaces.
    */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact-dup content fingerprint: md5 of normalized text. */
  def fingerprintMd5(c: Column): Column = md5(normalized(c))

  /** Character k-shingles of normalized text, distinct, via a codegen'd
    * higher-order `transform` over `sequence` (no explode, no shuffle).
    */
  def charShingles(c: Column, k: Int): Column = {
    val n = normalized(c)
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(n) - (k - 1), lit(1))),
        i => n.substr(i, lit(k))))
  }

  /** Word n-grams (space-joined), distinct. Prefer [[wordShinglesFromTokens]]
    * over an already-projected token column in multi-stage pipelines:
    * expressions inside higher-order lambdas don't participate in
    * common-subexpression elimination, so an inline `split` here would be
    * re-evaluated per shingle.
    */
  def wordShingles(c: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(normalized(c)), n)

  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  // --- Gopher/MassiveText document-quality rules (Rae et al. 2021, table
  // A1, the non-repetition half — the repetition half is gramRunStats).
  // Every signal is an integer count or a single per-row division, so the
  // DuckDB oracle replays them bit-for-bit.

  /** The eight English words of which Gopher requires at least two. */
  val gopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** How many of [[gopherRequiredWords]] appear in the (normalized) token
    * array — presence, not occurrence count: an integer sum of eight
    * `array_contains` probes, mirrored by the oracle's CASE sum.
    */
  def gopherRequiredStopCount(toks: Column): Column =
    gopherRequiredWords
      .map(w => array_contains(toks, w).cast("long"))
      .reduce(_ + _)

  /** Words containing at least one alphabetic character (over normalized
    * tokens, so the class is just `[a-z]`).
    */
  def alphaWordCount(toks: Column): Column =
    size(filter(toks, t => t.rlike("[a-z]")))

  /** Occurrences of Gopher's "symbols": the hash mark and the ellipsis
    * (both the three-dot spelling and U+2026). The rule is
    * symbol-to-word ratio ≤ 0.1.
    */
  def symbolCount(c: Column): Column =
    regexp_count(c, lit("#|\\.\\.\\.|…"))

  /** Raw lines of the document (split on newline, NOT trimmed — a document
    * without newlines is one line).
    */
  def lines(c: Column): Column = split(c, "\n", -1)

  /** Lines whose left-trimmed form starts with a bullet glyph
    * (•, ‣, ▪, "- ", "* "). Gopher drops docs where >90% of lines start
    * with a bullet.
    */
  def bulletLineCount(lines: Column): Column =
    size(filter(lines, l => ltrim(l).rlike("^(•|‣|▪|- |\\* )")))

  /** Lines ending with an ellipsis ("..." or U+2026); Gopher drops docs
    * where >30% of lines end this way.
    */
  def ellipsisLineCount(lines: Column): Column =
    size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$")))
}
