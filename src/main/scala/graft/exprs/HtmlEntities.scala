package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding — the one-pass scanner behind
  * [[graft.operators.HtmlExtract]]'s entity step. Real web text is
  * full of NUMERIC references (`&#8217;` / `&#x2019;` smart quotes,
  * `&#8212;` dashes, `&#160;` NBSP) that a fixed named-replacement
  * chain leaves as literal `&#NNNN;` bytes in the cleaned corpus —
  * which then poison dedup shingles and LM scoring downstream. This
  * expression decodes, in ONE left-to-right pass (so `&amp;lt;`
  * yields the literal `&lt;`, the HTML semantics):
  *
  *  - `&#NNNN;` decimal and `&#xHHHH;`/`&#XHHHH;` hex references,
  *    guarded: code points must be valid-plane (≤ U+10FFFF), not
  *    surrogates (U+D800–U+DFFF), not NUL, and at most 8 digits —
  *    anything invalid stays byte-for-byte literal (conservative:
  *    never manufacture U+FFFD the fixture can't predict);
  *  - the ~50 named entities that dominate real corpora (full table
  *    below), strictly `;`-terminated (the legacy semicolon-less
  *    forms are ambiguous mid-word and stay literal);
  *  - corpus-cleaning normalizations: NBSP (named or numeric 160)
  *    becomes a PLAIN SPACE (so whitespace canonicalization collapses
  *    it) and SOFT HYPHEN (`&shy;` / numeric 173) is dropped — both
  *    documented fixed points of the extraction contract.
  *
  * Unknown names and malformed references pass through untouched, so
  * the decode is total, deterministic, and replayable in the DuckDB
  * oracle via `chr()` arithmetic. Codegen ships as one static call
  * inside whole-stage codegen (the [[FixMojibake]] pattern).
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"html_entity_decode expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    HtmlEntities.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.HtmlEntities.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
}

object HtmlEntityDecode {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column): Column =
    GraftShim.column(HtmlEntityDecode(GraftShim.expression(text)))
}

object HtmlEntities {

  /** Named entities that dominate real corpora, `;`-terminated. NBSP
    * maps to plain space and SHY to nothing (see object scaladoc);
    * everything else to its Unicode character.
    */
  private val Named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](128)
    def p(name: String, value: String): Unit = m.put(name, value)
    p("amp", "&"); p("lt", "<"); p("gt", ">"); p("quot", "\""); p("apos", "'")
    p("nbsp", " "); p("shy", "")
    p("ndash", "–"); p("mdash", "—")
    p("lsquo", "‘"); p("rsquo", "’")
    p("ldquo", "“"); p("rdquo", "”")
    p("sbquo", "‚"); p("bdquo", "„")
    p("hellip", "…"); p("prime", "′"); p("Prime", "″")
    p("bull", "•"); p("dagger", "†"); p("Dagger", "‡")
    p("permil", "‰"); p("euro", "€"); p("trade", "™")
    p("copy", "©"); p("reg", "®"); p("deg", "°")
    p("middot", "·"); p("laquo", "«"); p("raquo", "»")
    p("sect", "§"); p("para", "¶"); p("micro", "µ")
    p("pound", "£"); p("yen", "¥"); p("cent", "¢")
    p("curren", "¤"); p("times", "×"); p("divide", "÷")
    p("plusmn", "±"); p("sup1", "¹"); p("sup2", "²")
    p("sup3", "³"); p("frac12", "½"); p("frac14", "¼")
    p("frac34", "¾"); p("iexcl", "¡"); p("iquest", "¿")
    p("agrave", "à"); p("aacute", "á"); p("acirc", "â")
    p("auml", "ä"); p("aring", "å"); p("aelig", "æ")
    p("ccedil", "ç"); p("egrave", "è"); p("eacute", "é")
    p("ecirc", "ê"); p("euml", "ë"); p("igrave", "ì")
    p("iacute", "í"); p("iuml", "ï"); p("ntilde", "ñ")
    p("ograve", "ò"); p("oacute", "ó"); p("ocirc", "ô")
    p("ouml", "ö"); p("oslash", "ø"); p("ugrave", "ù")
    p("uacute", "ú"); p("ucirc", "û"); p("uuml", "ü")
    p("szlig", "ß"); p("Eacute", "É"); p("Uuml", "Ü")
    p("Ouml", "Ö"); p("Auml", "Ä")
    m
  }

  /** Longest named entity we ever match (`frac12`, `permil` = 6). */
  private val MaxName = 6

  /** HTML5's windows-1252 reinterpretation of numeric references in
    * the C1 control range (0x80–0x9F); the five unmapped points
    * (0x81, 0x8D, 0x8F, 0x90, 0x9D) pass through unchanged.
    */
  private val C1Remap: Array[Long] = Array(
    0x20ac, 0x81, 0x201a, 0x192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x2c6, 0x2030, 0x160, 0x2039, 0x152, 0x8d, 0x17d, 0x8f,
    0x90, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x2dc, 0x2122, 0x161, 0x203a, 0x153, 0x9d, 0x17e, 0x178)

  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s // fast path: no references at all
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val next = decodeAt(str, i, sb)
        if (next > i) i = next
        else { sb.append('&'); i += 1 } // no reference here: literal
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Try to decode one reference starting at `i` (which holds '&');
    * on success append the replacement and return the index AFTER the
    * terminating ';', else return `i` unchanged (caller emits the '&'
    * literally). Single pass: the replacement is NEVER rescanned.
    */
  private def decodeAt(str: String, i: Int, sb: java.lang.StringBuilder): Int = {
    val n = str.length
    if (i + 1 >= n) return i
    if (str.charAt(i + 1) == '#') {
      // numeric: &#NNNN; or &#xHHHH; / &#XHHHH;
      var p = i + 2
      var hex = false
      if (p < n && (str.charAt(p) == 'x' || str.charAt(p) == 'X')) { hex = true; p += 1 }
      val digits0 = p
      var cp = 0L
      while (p < n && p - digits0 < 9 && isDigit(str.charAt(p), hex)) {
        cp = cp * (if (hex) 16 else 10) + digitVal(str.charAt(p))
        p += 1
      }
      if (p - digits0 == 0 || p - digits0 > 8) return i // no/overlong digits
      if (p >= n || str.charAt(p) != ';') return i // strict ';' termination
      if (cp == 0 || cp > 0x10ffff) return i // NUL / past last plane
      if (cp >= 0xd800 && cp <= 0xdfff) return i // surrogate
      // HTML5 numeric-charref quirk: C1 controls are reinterpreted as
      // windows-1252 (legacy pages write &#146; for a smart quote)
      if (cp >= 0x80 && cp <= 0x9f) cp = C1Remap(cp.toInt - 0x80)
      if (cp == 160) sb.append(' ') // NBSP → plain space (see scaladoc)
      else if (cp == 173) () // SOFT HYPHEN → dropped
      else sb.appendCodePoint(cp.toInt)
      p + 1
    } else {
      // named: letters/digits up to MaxName, then ';'
      var p = i + 1
      val start = p
      while (p < n && p - start <= MaxName && isAlnum(str.charAt(p))) p += 1
      if (p - start < 2 || p - start > MaxName) return i
      if (p >= n || str.charAt(p) != ';') return i
      val rep = Named.get(str.substring(start, p))
      if (rep == null) return i // unknown name: literal
      sb.append(rep)
      p + 1
    }
  }

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10
}
