package graft.operators

/** MediaWiki XML dump walk (the `export-0.10` page/revision grammar —
  * the distribution format of every Wikipedia/Wikimedia dump, and with
  * it a large fraction of the public encyclopedic text that LLM
  * corpora start from). Reference scope anchor: the reference engine's
  * only analyzed-text surface is the memo `text` analyzer
  * (`/root/reference/definitions/index-templates.ts:48`); this front
  * door is that surface's 100 TB corpus generalization, alongside
  * [[Warc]] (crawl), [[Tar]]/[[ZipWalk]] (bulk archives) and
  * [[MimeWalk]] (mail).
  *
  * Grammar (public schema, mediawiki.org/xml/export-0.10.xsd): a
  * `<mediawiki>` root, one `<siteinfo>`, then `<page>` elements — each
  * with `<title>`, `<ns>`, a page-level `<id>`, an optional
  * `<redirect title="..."/>`, and one or more `<revision>` elements
  * carrying `<id>`, `<timestamp>`, `<contributor>` (`<username>` or
  * `<ip>`), an optional `<minor/>` marker and the `<text
  * xml:space="preserve">` payload (possibly self-closing, possibly
  * CDATA). The walk is a hand-rolled pull scan — indexOf-driven, no
  * DOM, bytes-linear — because dump shards are hundreds of GiB and the
  * only structure we need is the page/revision skeleton.
  *
  * XML text is unescaped with the FIVE XML entities plus numeric
  * character references only (`xmlUnescape`); HTML-level entities that
  * MediaWiki leaves in wikitext (`&ndash;` …) are NOT decoded here —
  * that is [[graft.exprs.HtmlEntityDecode]]'s job downstream, keeping
  * the XML layer and the wikitext layer separately testable.
  *
  * Quarantine contract (the [[Warc]]/[[Tar]] member-resync shape): a
  * page whose `</page>` never arrives before the next `<page>` (torn
  * element), or whose required fields don't parse, yields exactly ONE
  * corrupt row and the walk resynchronizes at the next `<page>`
  * marker. Garbage between pages is skipped without a row.
  *
  * Scale shape: one dump shard per row inside `mapPartitions` —
  * scan-local, zero shuffle before the caller's aggregate; compressed
  * shards compose through [[Codecs]] exactly like `.tar.zst`.
  */
object WikiDump {

  /** One revision row (one row per revision — full-history dumps carry
    * many per page; `rev_ordinal` is the in-page document order).
    */
  final case class RevRow(
      doc_id: Long, // shard id (input row)
      page_id: Long,
      title: String,
      ns: Int,
      redirect: String, // null unless a <redirect/> page
      rev_id: Long,
      rev_ordinal: Int,
      rev_count: Int, // revisions in this page (same on every row)
      timestamp: String,
      contributor: String,
      minor: Boolean,
      text: String,
      corrupt: Boolean)

  // ------------------------------------------------------------- scan

  /** Unescape XML content: the five XML entities + numeric charrefs
    * (strict `;` termination, valid-plane, non-surrogate). Unknown
    * names stay literal — MediaWiki keeps HTML entities like `&ndash;`
    * escaped as `&amp;ndash;` in dumps, so after this pass they are
    * exactly the wikitext bytes an editor typed.
    */
  private[operators] def xmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) { sb.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "lt" => "<"
            case "gt" => ">"
            case "amp" => "&"
            case "quot" => "\""
            case "apos" => "'"
            case _ =>
              if (name.length >= 2 && name.charAt(0) == '#') {
                val hex = name.charAt(1) == 'x' || name.charAt(1) == 'X'
                val digits = if (hex) name.substring(2) else name.substring(1)
                try {
                  val cp = java.lang.Long.parseLong(digits, if (hex) 16 else 10)
                  if (digits.isEmpty || cp <= 0 || cp > 0x10ffff ||
                    (cp >= 0xd800 && cp <= 0xdfff)) null
                  else new String(Character.toChars(cp.toInt))
                } catch { case _: Exception => null }
              } else null
          }
          if (rep == null) { sb.append('&'); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  /** Content of the first `<tag>...</tag>` inside `s[from, to)`, RAW
    * (not unescaped); -1-pair when absent. Handles attributes on the
    * open tag and the self-closing form (empty content).
    */
  private def element(s: String, tag: String, from: Int, to: Int): (Int, Int) = {
    var p = from
    val open = "<" + tag
    while (p < to) {
      val i = s.indexOf(open, p)
      if (i < 0 || i >= to) return (-1, -1)
      val after = i + open.length
      if (after < to && (s.charAt(after) == '>' || s.charAt(after) == ' ' ||
          s.charAt(after) == '/' || s.charAt(after) == '\n')) {
        val gt = s.indexOf('>', after)
        if (gt < 0 || gt >= to) return (-1, -1)
        if (s.charAt(gt - 1) == '/') return (gt + 1, gt + 1) // self-closing
        val close = s.indexOf("</" + tag + ">", gt + 1)
        if (close < 0 || close > to) return (-1, -1)
        return (gt + 1, close)
      }
      p = i + 1 // "<text" matched "<textarea"-style prefix: keep looking
    }
    (-1, -1)
  }

  private def elementText(s: String, tag: String, from: Int, to: Int): String = {
    val (a, b) = element(s, tag, from, to)
    if (a < 0) null
    else {
      val raw = s.substring(a, b)
      // CDATA: literal content, no unescape
      if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
        raw.substring(9, raw.length - 3)
      else xmlUnescape(raw)
    }
  }

  /** Value of `attr="..."` on the first `<tag .../>` in range, or null. */
  private def attrOf(s: String, tag: String, attr: String, from: Int, to: Int): String = {
    val i = s.indexOf("<" + tag, from)
    if (i < 0 || i >= to) return null
    val gt = s.indexOf('>', i)
    if (gt < 0 || gt >= to) return null
    val head = s.substring(i, gt)
    val k = head.indexOf(attr + "=\"")
    if (k < 0) return null
    val vStart = k + attr.length + 2
    val vEnd = head.indexOf('"', vStart)
    if (vEnd < 0) return null
    xmlUnescape(head.substring(vStart, vEnd))
  }

  private def parseLong(s: String): Long =
    if (s == null) -1L
    else try s.trim.toLong
    catch { case _: Exception => -1L }

  /** Walk one dump shard into revision rows. */
  def revisions(shardId: Long, bytes: Array[Byte]): Seq[RevRow] = {
    if (bytes == null || bytes.length == 0) return Seq.empty
    val s = graft.functions.Text.decodeCharset(bytes)
    if (s == null) return Seq.empty
    val out = scala.collection.mutable.Buffer.empty[RevRow]
    def corruptRow(): RevRow = RevRow(shardId, -1L, null, -1, null, -1L, -1, 0,
      null, null, minor = false, text = null, corrupt = true)
    var p = 0
    while (p < s.length) {
      val start = s.indexOf("<page>", p)
      if (start < 0) return out.toSeq
      val end = s.indexOf("</page>", start)
      val next = s.indexOf("<page>", start + 6)
      if (end < 0 || (next >= 0 && next < end)) {
        // torn page: quarantine ONE row, resync at the next <page>
        out += corruptRow()
        p = if (next >= 0) next else s.length
      } else {
        val firstRev = s.indexOf("<revision>", start)
        val headEnd = if (firstRev >= 0 && firstRev < end) firstRev else end
        val title = elementText(s, "title", start, headEnd)
        val ns = parseLong(elementText(s, "ns", start, headEnd))
        val pageId = parseLong(elementText(s, "id", start, headEnd))
        val redirect = attrOf(s, "redirect", "title", start, headEnd)
        if (title == null || pageId < 0) {
          out += corruptRow()
        } else {
          // collect revision spans
          var revs = List.empty[(Int, Int)]
          var rp = firstRev
          while (rp >= 0 && rp < end) {
            val rEnd = s.indexOf("</revision>", rp)
            if (rEnd < 0 || rEnd > end) rp = -1
            else {
              revs = (rp, rEnd) :: revs
              rp = s.indexOf("<revision>", rEnd)
            }
          }
          val ordered = revs.reverse
          if (ordered.isEmpty) out += corruptRow()
          else {
            val total = ordered.length
            var ord = 0
            for ((ra, rb) <- ordered) {
              val revId = parseLong(elementText(s, "id", ra, rb))
              val ts = elementText(s, "timestamp", ra, rb)
              val (ca, cb) = element(s, "contributor", ra, rb)
              val who =
                if (ca < 0) null
                else {
                  val u = elementText(s, "username", ca, cb)
                  if (u != null) u else elementText(s, "ip", ca, cb)
                }
              val minor = {
                val i = s.indexOf("<minor/>", ra)
                i >= 0 && i < rb
              }
              val text = elementText(s, "text", ra, rb)
              if (revId < 0 || text == null) out += corruptRow()
              else out += RevRow(shardId, pageId, title, ns.toInt, redirect,
                revId, ord, total, ts, who, minor, text, corrupt = false)
              ord += 1
            }
          }
        }
        p = end + 7
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------ fixture

  /** One page to serialize: (pageId, title, ns, redirectTo,
    * revisions as (revId, timestamp, contributor, minor, text)).
    */
  final case class PageSpec(
      pageId: Long,
      title: String,
      ns: Int,
      redirectTo: Option[String],
      revs: Seq[(Long, String, String, Boolean, String)])

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Serialize pages as an export-0.10 dump shard. `tornPage` (index
    * into `pages`) replaces that page's `</page>` with a torn-off
    * comment — the quarantine-and-resync witness; `cdataPage` writes
    * that page's last revision text as CDATA (grammar witness).
    */
  def fixture(
      pages: Seq[PageSpec],
      tornPage: Int = -1,
      cdataPage: Int = -1): Array[Byte] = {
    val sb = new java.lang.StringBuilder(4096)
    sb.append("<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.10/\" version=\"0.10\" xml:lang=\"en\">\n")
    sb.append("  <siteinfo>\n    <sitename>graftwiki</sitename>\n")
    sb.append("    <namespaces>\n      <namespace key=\"0\"/>\n      <namespace key=\"10\">Template</namespace>\n    </namespaces>\n  </siteinfo>\n")
    for ((pg, idx) <- pages.zipWithIndex) {
      sb.append("  <page>\n")
      sb.append("    <title>").append(esc(pg.title)).append("</title>\n")
      sb.append("    <ns>").append(pg.ns).append("</ns>\n")
      sb.append("    <id>").append(pg.pageId).append("</id>\n")
      pg.redirectTo.foreach(t =>
        sb.append("    <redirect title=\"").append(esc(t)).append("\" />\n"))
      for (((revId, ts, who, minor, text), ri) <- pg.revs.zipWithIndex) {
        sb.append("    <revision>\n")
        sb.append("      <id>").append(revId).append("</id>\n")
        sb.append("      <timestamp>").append(ts).append("</timestamp>\n")
        sb.append("      <contributor><username>").append(esc(who))
          .append("</username></contributor>\n")
        if (minor) sb.append("      <minor/>\n")
        sb.append("      <model>wikitext</model>\n      <format>text/x-wiki</format>\n")
        val body =
          if (idx == cdataPage && ri == pg.revs.length - 1 &&
            !text.contains("]]>")) "<![CDATA[" + text + "]]>"
          else esc(text)
        sb.append("      <text bytes=\"")
          .append(text.getBytes("UTF-8").length)
          .append("\" xml:space=\"preserve\">").append(body).append("</text>\n")
        sb.append("    </revision>\n")
      }
      if (idx == tornPage) sb.append("  <!-- torn shard: element never closed\n")
      else sb.append("  </page>\n")
    }
    sb.append("</mediawiki>\n")
    sb.toString.getBytes("UTF-8")
  }

  // ------------------------------------------------------------- Spark

  /** Partition-parallel revision walk over (doc_id, payload) — one
    * dump shard per row, scan-local.
    */
  def parseRevisions(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[RevRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => revisions(id, bytes) })
  }
}
