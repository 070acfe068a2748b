package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale training-data pipelines.
  * Pure `functions._` compositions, no UDFs. All are codegen'd string
  * arithmetic except `bpeTokenEstimate`, whose per-word fold is a
  * higher-order `aggregate` (HOFs never enter whole-stage codegen) —
  * acceptable because it is ONE interpreted pass with a two-op lambda,
  * unlike the 64-pass signing chains that justified the fused native
  * expressions in `graft.exprs`.
  */
object Text {

  /** Mixed-charset byte→text decoding — the shared front-door seam for
    * every payload-to-text step (WARC bodies, TAR entries, ZIP entries,
    * mbox parts). Real corpora are NOT all UTF-8; decoding them as if
    * they were silently mojibakes every legacy page at ingest (the
    * `fix_mojibake` expression repairs after the fact — this prevents
    * it at the door). Deterministic detection ladder:
    *
    *  1. BOM: UTF-8 (EF BB BF) → strict UTF-8 of the remainder;
    *     UTF-16 LE (FF FE) / BE (FE FF) → the indicated UTF-16 flavor;
    *  2. no BOM: a strict RFC 3629 validity scan — valid ⇒ UTF-8
    *     (ASCII is a trivial subset);
    *  3. fallback: windows-1252 — the de-facto legacy web encoding
    *     (NOT ISO-8859-1: bytes 0x80–0x9F are the smart-quote/dash/
    *     euro glyphs, matching the HTML5 charref C1 remap).
    *
    * Any decode failure inside a branch falls through to the cp1252
    * total fallback — garbage in, deterministic text out, never a
    * throw. Heuristic honestly bounded: no charset sniffing beyond
    * BOM+validity (no chardet statistics), no UTF-32, no EBCDIC.
    */
  def decodeCharset(b: Array[Byte]): String = {
    if (b == null) return null
    def strict(bytes: Array[Byte], off: Int, name: String): String = {
      val dec = java.nio.charset.Charset.forName(name).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off))
        .toString
    }
    try {
      if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf) strict(b, 3, "UTF-8")
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
        strict(b, 2, "UTF-16LE")
      else if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
        strict(b, 2, "UTF-16BE")
      else strict(b, 0, "UTF-8")
    } catch {
      case _: Exception => new String(b, java.nio.charset.Charset.forName("windows-1252"))
    }
  }

  /** Whitespace token count (any-run-of-whitespace delimiter). */
  def tokenCount(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, lit(0L)).otherwise(size(split(t, "\\s+"))).cast("long")
  }

  /** Simple whitespace token count assuming single spaces (matches the
    * synthetic corpus and the DuckDB oracle arithmetic exactly).
    */
  def tokenCountSimple(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, lit(0L))
      .otherwise(length(t) - length(replace(t, lit(" "), lit(""))) + lit(1L))
      .cast("long")
  }

  /** Tokenized array (for shingles / set similarity). */
  def tokens(text: Column): Column = split(trim(text), " +")

  /** BPE-ish subword count: words + intra-word split points estimated as
    * ceil(len/4) per word — a deterministic, tokenizer-free estimate of
    * LLM token counts (≈ chars/4 heuristic published for BPE vocabularies).
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, w) => acc + greatest(lit(1L), ceil(length(w) / lit(4.0)).cast("long")))

  /** Quality score in [0,1]: blend of length band, punctuation ratio and
    * mean word length band — the shape of reference-corpus quality filters
    * (Gopher/C4-style rules), all codegen'd arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val t = trim(text)
    val n = length(t).cast("double")
    val toks = tokenCountSimple(t).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[\\.,;:!?]", ""))).cast("double")
    val meanWord = (n - toks + 1) / greatest(toks, lit(1.0))
    val lenScore = when(n < 50, n / 50.0).when(n > 5000, lit(0.5)).otherwise(lit(1.0))
    val punctScore = when(punct / greatest(n, lit(1.0)) > 0.1, lit(0.5)).otherwise(lit(1.0))
    val wordScore = when(meanWord.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    round(lenScore * punctScore * wordScore, 4)
  }

  /** Stopword-count language scorer: number of occurrences of each marker
    * token, via length arithmetic (codegen'd, no regex state machine).
    */
  def markerHits(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), trim(text), lit(" "))
    val needle = s" $marker "
    // non-overlapping occurrences of " marker "
    floor((length(padded) - length(replace(padded, lit(needle), lit(""))))
      / lit(needle.length)).cast("long")
  }

  /** N-gram-heuristic language ID over a marker-word table. Returns the
    * language whose marker list hits most; ties and zero-hit rows →
    * "und". Markers chosen for the synthetic corpus's English-like token
    * stream: real deployments pass per-language marker lists.
    */
  def langIdScore(text: Column, markers: Map[String, Seq[String]]): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        ms.map(m => markerHits(text, m)).reduce(_ + _).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Within-document repetition score in [0, 1): the fraction of word
    * n-gram instances that repeat an earlier instance —
    * `(total − distinct) / total` — the Gopher-style "repeated n-gram"
    * quality signal (high = templated/spammy text). Both counts are
    * single codegen'd passes (`Shingles` is the distinct side); the
    * division of two small exact ints is emitted raw, never rounded.
    * Documents with fewer than n tokens score 0.
    */
  def repetitionScore(text: Column, n: Int): Column = {
    // token count from the SAME tokenizer Shingles uses (space runs), not
    // tokenCount's \s+ — mixing them over-counts grams on text with tabs/
    // newlines and manufactures repetition that isn't there. An empty
    // trimmed text splits to [""], so total still bottoms out at 0.
    val total = greatest(size(tokens(text)) - lit(n - 1), lit(0)).cast("double")
    val distinct = size(graft.exprs.Shingles(text, n)).cast("double")
    when(total <= 0, lit(0.0)).otherwise((total - distinct) / total)
  }

  /** The Gopher rule battery (Rae et al. 2021, appendix A) as a struct of
    * per-rule booleans plus the conjunction — the structured version of
    * [[qualityScore]]'s blended scalar: pipelines want to know WHICH rule
    * rejected a document (to tune thresholds per source), not just that
    * one did. Rules: word count in [50, 100k]; mean word length in
    * [3, 10]; symbol-to-word ratio (# and …) ≤ 0.1; ≤ 10% of lines
    * bullet-led; ≤ 30% of lines ellipsis-ended; ≥ 80% of words contain a
    * letter; ≥ 2 of the stopword list present (default: the paper's 8
    * English function words — pass a per-language/per-corpus list, same
    * as [[langIdScore]]'s marker table).
    *
    * Ratio thresholds compare in INTEGER arithmetic (10·bullets ≤ lines,
    * not bullets/lines ≤ 0.1) so no engine can disagree on a float
    * boundary. Everything is codegen'd column arithmetic except the two
    * per-line/per-word `filter` HOFs (short arrays, interpreted lambda —
    * the surrounding scan dominates).
    */
  def gopherFlags(
      text: Column,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): Column = {
    require(stopwords.size >= 2, "the ≥2-stopwords rule needs at least 2 candidates")
    val t = trim(text)
    val ws = tokens(t)
    val wc = size(ws)
    val ls = split(t, "\n")
    val nl = size(ls)
    val hashN = length(t) - length(replace(t, lit("#"), lit("")))
    val ellN3 = length(t) - length(replace(t, lit("..."), lit("")))
    val alphaW = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val bulletL = size(filter(ls, l => substring(trim(l), 1, 1).isin("-", "•", "*")))
    val ellL = size(filter(ls, l => endswith(trim(l), lit("..."))))
    val stops = stopwords
      .map(s => array_contains(ws, s).cast("int")).reduce(_ + _)
    val meanWord = length(replace(t, lit(" "), lit(""))).cast("double") /
      greatest(wc, lit(1)).cast("double")
    struct(
      wc.between(50, 100000).as("wc_ok"),
      meanWord.between(3.0, 10.0).as("mean_word_ok"),
      (lit(10) * (lit(3) * hashN + ellN3) <= lit(3) * wc).as("symbol_ok"),
      (lit(10) * bulletL <= nl).as("bullet_ok"),
      (lit(10) * ellL <= lit(3) * nl).as("ellipsis_ok"),
      (lit(5) * alphaW >= lit(4) * wc).as("alpha_ok"),
      (stops >= 2).as("stopword_ok"))
  }

  /** PII redaction: emails → `<EMAIL>`, dotted-quad IPv4 → `<IP>`,
    * `+`-prefixed phone-shaped digit runs → `<PHONE>` — the C4-style
    * scrub step a training corpus runs before anything else sees the
    * text. Three codegen'd `regexp_replace` passes; the patterns are
    * restricted to the RE2 ∩ java.util.regex common subset (character
    * classes, bounded repeats, ASCII `\b`) so an external SQL engine
    * applying the same three patterns reproduces the output
    * byte-for-byte. Order matters: emails first (their local parts
    * contain digits and dots), then dotted quads, then phone runs.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+\\d[\\d ()-]{6,}\\d", "<PHONE>")
  }

  /** Count of redaction markers in already-redacted text (audit column
    * for [[redactPii]]): occurrences via length arithmetic, no regex.
    */
  def piiHits(redacted: Column): Column =
    Seq("<EMAIL>", "<IP>", "<PHONE>").map { m =>
      ((length(redacted) - length(replace(redacted, lit(m), lit("")))) /
        lit(m.length)).cast("long")
    }.reduce(_ + _)

  /** Content-defined document fingerprint: 64-bit FNV-1a-style rolling
    * hash of the normalized text, built from Spark's xxhash64 over
    * fixed-stride substrings — deterministic and cheap. For exact-dup
    * detection prefer `md5`/`sha2` (also available to SQL oracles).
    */
  def fingerprint(text: Column): Column = xxhash64(lower(trim(text)))

  /** Exact-dup key (hex MD5 of normalized text) — matches DuckDB md5(). */
  def exactKey(text: Column): Column = md5(lower(trim(text)))

  /** Canonical text fold (NFD accent-strip + lowercase + whitespace
    * collapse) — the native [[graft.exprs.NormalizeText]] expression.
    */
  def normalize(text: Column): Column = graft.exprs.NormalizeText(text)

  /** Fraction of characters matching a regex character class — the
    * script-level quality signal (gibberish, base64 blobs, and
    * wrong-script text stand out immediately in letter/digit/space
    * ratios). Length arithmetic over one codegen'd `regexp_replace`;
    * the terminal division is a single IEEE op, emitted raw (the
    * deterministic-division convention). Empty text scores 0.
    */
  def charClassRatio(text: Column, pattern: String): Column = {
    val n = length(text).cast("double")
    when(n === 0, lit(0.0))
      .otherwise((n - length(regexp_replace(text, pattern, ""))).cast("double") / n)
  }

  /** Shannon entropy (bits) of the code-point distribution — the
    * gibberish/repetition scalar ([[graft.exprs.CharEntropy]], one
    * codegen'd pass). Snap with `round(…, 4)` when comparing across
    * engines (unordered SQL aggregation vs this expression's pinned
    * ascending-code-point order).
    */
  def charEntropy(text: Column): Column = graft.exprs.CharEntropy(text)
}
