package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Wikitext → plain text, one deterministic left-to-right scan — the
  * markup-removal stage of the [[graft.operators.WikiDump]] ingestion
  * path (dump XML gives wikitext; LLM corpora want prose). The subset
  * is the part of the public MediaWiki markup grammar that carries or
  * hides PROSE; everything here is documented, total, and replayable,
  * so the fixture oracle can state the expected output in closed form:
  *
  *  - `<!-- … -->` comments dropped (unterminated → rest dropped);
  *  - `{{ … }}` templates dropped, nesting counted by `{{`/`}}` token
  *    pairs (an unterminated template drops the tail — the consumed
  *    region is by definition template arguments, not prose);
  *  - `{| … |}` tables dropped when `{|` opens a LINE (the MediaWiki
  *    grammar requires line-start), nested tables counted line-wise;
  *  - `[[target|label]]` → recursively-stripped `label`, `[[target]]`
  *    → `target`; links whose target namespace is `File:`/`Image:`/
  *    `Category:` (case-insensitive) are dropped whole, including
  *    nested caption links; interwiki prefixes are NOT special-cased
  *    (the label keeps its `xx:` prefix — documented honest subset);
  *  - `[scheme://url label]` external links → recursively-stripped
  *    label; bare `[scheme://url]` dropped (schemes: http/https/ftp,
  *    protocol-relative `//`); a `[` that opens neither form is
  *    literal;
  *  - `<ref…>…</ref>`, `<gallery>`, `<math>`, `<source>`,
  *    `<syntaxhighlight>`, `<score>`, `<timeline>` drop tag AND
  *    content (self-closing `<ref name=x/>` drops the tag); all other
  *    `<tag …>` / `</tag>` markup drops the TAG ONLY — `<nowiki>`
  *    content is kept but still flows through the scan, so markup
  *    inside it strips (documented honest subset; true nowiki
  *    verbatim semantics would need an escape channel the corpus
  *    never wants anyway); a `<` not opening a tag is literal;
  *  - `'''''`/`'''`/`''` emphasis runs dropped (longest match; a
  *    single `'` is literal);
  *  - line-start list/indent markers (runs of `*#:;` + one following
  *    space) dropped; line-start `=…= heading =…=` keeps the
  *    recursively-stripped inner text; line-start `----` rules
  *    dropped.
  *
  * Output whitespace is NOT collapsed here — compose with the
  * pipeline's whitespace canonicalization (the [[NormalizeText]] /
  * oracle `regexp_replace(…, '\s+', ' ')` step), which also makes the
  * oracle immune to newline bookkeeping. Codegen ships as one static
  * call inside whole-stage codegen (the [[HtmlEntityDecode]] pattern).
  */
case class WikitextStrip(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wikitext_strip expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    Wikitext.strip(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.Wikitext.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): WikitextStrip =
    copy(child = newChild)
}

object WikitextStrip {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column): Column =
    GraftShim.column(WikitextStrip(GraftShim.expression(text)))
}

object Wikitext {

  /** Tags whose CONTENT is dropped with the tag (non-prose islands). */
  private val DropContent = java.util.Set.of(
    "ref", "gallery", "math", "source", "syntaxhighlight", "score", "timeline")

  /** Namespaces whose whole `[[…]]` link is dropped. */
  private def isDroppedNamespace(target: String, colon: Int): Boolean = {
    val ns = target.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
    ns == "file" || ns == "image" || ns == "category"
  }

  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    stripInto(str, 0, str.length, sb, atLineStart0 = true, depth = 0)
    UTF8String.fromString(sb.toString)
  }

  /** Scan `str[from, to)` appending stripped prose to `sb`. `depth`
    * bounds link-label recursion (pathological nesting appends raw
    * past 8 levels — still total and deterministic).
    */
  private def stripInto(str: String, from: Int, to: Int,
      sb: java.lang.StringBuilder, atLineStart0: Boolean, depth: Int): Unit = {
    var i = from
    var atLineStart = atLineStart0
    while (i < to) {
      val c = str.charAt(i)
      // ---- line-start grammar first
      if (atLineStart) {
        if (c == '{' && i + 1 < to && str.charAt(i + 1) == '|') {
          i = skipTable(str, i, to); atLineStart = true
        } else if (c == '=') {
          i = heading(str, i, to, sb, depth); atLineStart = true
        } else if (c == '*' || c == '#' || c == ':' || c == ';') {
          var p = i
          while (p < to && (str.charAt(p) == '*' || str.charAt(p) == '#' ||
            str.charAt(p) == ':' || str.charAt(p) == ';')) p += 1
          if (p < to && str.charAt(p) == ' ') p += 1
          i = p; atLineStart = false
        } else if (c == '-' && i + 3 < to && str.startsWith("----", i)) {
          var p = i + 4
          while (p < to && str.charAt(p) == '-') p += 1
          i = p; atLineStart = false
        } else atLineStart = false
      } else if (c == '\n') {
        sb.append(c); i += 1; atLineStart = true
      } else if (c == '<') {
        i = tag(str, i, to, sb); atLineStart = false
      } else if (c == '{' && i + 1 < to && str.charAt(i + 1) == '{') {
        i = skipTemplate(str, i, to); atLineStart = false
      } else if (c == '[') {
        i = link(str, i, to, sb, depth); atLineStart = false
      } else if (c == '\'' && i + 1 < to && str.charAt(i + 1) == '\'') {
        var p = i
        while (p < to && p - i < 5 && str.charAt(p) == '\'') p += 1
        // runs of 2,3,5 are emphasis; a run of 4 = ''' + literal '
        if (p - i == 4) { sb.append('\''); i = p }
        else i = p
        atLineStart = false
      } else {
        sb.append(c); i += 1
        if (c == '\n') atLineStart = true else atLineStart = false
      }
    }
  }

  /** `{{ … }}` with `{{`/`}}` token-pair counting; returns index after
    * the closing `}}` (or `to` — tail dropped — when unterminated).
    */
  private def skipTemplate(str: String, i0: Int, to: Int): Int = {
    var i = i0 + 2
    var d = 1
    while (i < to && d > 0) {
      val c = str.charAt(i)
      if (c == '{' && i + 1 < to && str.charAt(i + 1) == '{') { d += 1; i += 2 }
      else if (c == '}' && i + 1 < to && str.charAt(i + 1) == '}') { d -= 1; i += 2 }
      else i += 1
    }
    i
  }

  /** Line-start `{|` table through the matching line-start `|}`. */
  private def skipTable(str: String, i0: Int, to: Int): Int = {
    var d = 1
    var i = str.indexOf('\n', i0)
    while (i >= 0 && i < to && d > 0) {
      val ls = i + 1
      if (ls + 1 < to && str.charAt(ls) == '{' && str.charAt(ls + 1) == '|') d += 1
      else if (ls + 1 < to && str.charAt(ls) == '|' && str.charAt(ls + 1) == '}') {
        d -= 1
        if (d == 0) {
          // resume after the `|}` token (same line's remainder is kept)
          return ls + 2
        }
      }
      i = str.indexOf('\n', ls)
    }
    to // unterminated table: rest is table rows, not prose
  }

  /** Line-start `=…= inner =…=` heading: strip the `=` runs, emit the
    * recursively-stripped inner, return index at the line's `\n` (so
    * the newline itself flows through the main loop).
    */
  private def heading(str: String, i0: Int, to: Int,
      sb: java.lang.StringBuilder, depth: Int): Int = {
    var eol = str.indexOf('\n', i0)
    if (eol < 0 || eol > to) eol = to
    var a = i0
    while (a < eol && str.charAt(a) == '=') a += 1
    var b = eol
    while (b > a && (str.charAt(b - 1) == ' ' || str.charAt(b - 1) == '\t')) b -= 1
    var b2 = b
    while (b2 > a && str.charAt(b2 - 1) == '=') b2 -= 1
    if (b2 < b && b2 > a) b = b2 // had a trailing = run
    while (a < b && str.charAt(a) == ' ') a += 1
    while (b > a && str.charAt(b - 1) == ' ') b -= 1
    if (b > a) stripInto(str, a, b, sb, atLineStart0 = false, depth)
    eol
  }

  /** `<…>` markup at `i0`: drop tag (and content for the non-prose
    * islands); a `<` that opens no tag is literal.
    */
  private def tag(str: String, i0: Int, to: Int, sb: java.lang.StringBuilder): Int = {
    if (str.startsWith("<!--", i0)) {
      val e = str.indexOf("-->", i0 + 4)
      return if (e < 0 || e + 3 > to) to else e + 3
    }
    if (i0 + 1 >= to) { sb.append('<'); return i0 + 1 }
    val c1 = str.charAt(i0 + 1)
    val isOpen = (c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')
    if (!isOpen && c1 != '/') { sb.append('<'); return i0 + 1 }
    val gt = str.indexOf('>', i0 + 1)
    if (gt < 0 || gt >= to) { sb.append('<'); return i0 + 1 }
    if (c1 == '/') return gt + 1 // closing tag: drop
    var ne = i0 + 1
    while (ne < gt && Character.isLetterOrDigit(str.charAt(ne))) ne += 1
    val name = str.substring(i0 + 1, ne).toLowerCase(java.util.Locale.ROOT)
    val selfClosing = str.charAt(gt - 1) == '/'
    if (!selfClosing && DropContent.contains(name)) {
      // full-token close match: "</ref" must not terminate at
      // "</reflist>" — the char after the name must end the tag
      val tok = "</" + name
      var close = str.indexOf(tok, gt + 1)
      while (close >= 0 && close < to) {
        val after = close + tok.length
        if (after >= to) { close = -1 }
        else {
          val ca = str.charAt(after)
          if (ca == '>' || Character.isWhitespace(ca)) {
            val cgt = str.indexOf('>', close)
            return if (cgt < 0 || cgt >= to) to else cgt + 1
          }
          close = str.indexOf(tok, close + 1)
        }
      }
      return to // unterminated island
    }
    gt + 1
  }

  /** `[[…]]` wiki link (nesting-aware) or `[scheme url label]`
    * external link at `i0`; otherwise the `[` is literal.
    */
  private def link(str: String, i0: Int, to: Int,
      sb: java.lang.StringBuilder, depth: Int): Int = {
    if (i0 + 1 < to && str.charAt(i0 + 1) == '[') {
      // wiki link: find matching ]] counting nested [[
      var i = i0 + 2
      var d = 1
      var lastPipe = -1 // last top-level '|'
      val start = i
      while (i < to && d > 0) {
        val c = str.charAt(i)
        if (c == '[' && i + 1 < to && str.charAt(i + 1) == '[') { d += 1; i += 2 }
        else if (c == ']' && i + 1 < to && str.charAt(i + 1) == ']') { d -= 1; i += 2 }
        else {
          if (c == '|' && d == 1) lastPipe = i
          i += 1
        }
      }
      if (d > 0) { sb.append('['); return i0 + 1 } // unterminated: literal [
      val end = i - 2
      val targetEnd = if (lastPipe >= 0) {
        // first top-level pipe bounds the target
        var fp = start
        var dd = 1
        var found = -1
        while (fp < end && found < 0) {
          val c = str.charAt(fp)
          if (c == '[' && str.charAt(fp + 1) == '[') { dd += 1; fp += 2 }
          else if (c == ']' && fp + 1 < end && str.charAt(fp + 1) == ']') { dd -= 1; fp += 2 }
          else { if (c == '|' && dd == 1) found = fp; fp += 1 }
        }
        if (found >= 0) found else end
      } else end
      val target = str.substring(start, targetEnd)
      val colon = target.indexOf(':')
      if (colon > 0 && isDroppedNamespace(target, colon)) return i
      if (lastPipe >= 0) {
        if (depth < 8)
          stripInto(str, lastPipe + 1, end, sb, atLineStart0 = false, depth + 1)
        else sb.append(str, lastPipe + 1, end)
      } else sb.append(target)
      i
    } else {
      // external link: require a scheme
      val rest = i0 + 1
      val isExt = str.startsWith("http://", rest) || str.startsWith("https://", rest) ||
        str.startsWith("ftp://", rest) || str.startsWith("//", rest)
      if (!isExt) { sb.append('['); return i0 + 1 }
      val close = str.indexOf(']', rest)
      if (close < 0 || close >= to) { sb.append('['); return i0 + 1 }
      val sp = str.indexOf(' ', rest)
      if (sp >= 0 && sp < close) {
        if (depth < 8)
          stripInto(str, sp + 1, close, sb, atLineStart0 = false, depth + 1)
        else sb.append(str, sp + 1, close)
      }
      close + 1
    }
  }
}
