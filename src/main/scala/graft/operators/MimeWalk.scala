package graft.operators

import scala.collection.mutable

/** mbox + MIME email walk (RFC 4155 mailbox framing, RFC 5322 message
  * grammar, RFC 2045/2046 MIME bodies, RFC 2047 encoded-word headers)
  * — mail-archive corpora are a classic pretraining text source, and
  * the decode chain (mbox split → header unfold → multipart recursion
  * → base64 / quoted-printable transfer decode) is exactly the kind of
  * per-row byte work that belongs inside `mapPartitions`.
  *
  * Grammar implemented:
  *   - mbox: messages framed by `From ` separator lines at
  *     line-start; `>From`-quoted body lines unquoted per mboxrd
  *     (one `>` stripped from `^>+From `);
  *   - headers: case-insensitive names, continuation-line unfolding
  *     (leading SP/HT), first occurrence wins; `Content-Type`
  *     parameters parsed with optional quotes;
  *   - RFC 2047 encoded words in Subject/From (`=?charset?B?...?=`
  *     and `?Q?` with `_` = space), adjacent words joined per spec;
  *   - multipart bodies split on `--boundary` lines, terminated by
  *     `--boundary--`, preamble/epilogue dropped, nesting recursive;
  *   - transfer decode: `7bit`/`8bit`/`binary` raw, `base64` via the
  *     JDK MIME decoder (whitespace-tolerant), `quoted-printable`
  *     with `=XX` escapes and soft line breaks.
  *
  * Quarantine contract: a message whose declared multipart boundary
  * never occurs, or with no header/body separator, is corrupt (headers
  * kept when parseable, text empty); other messages in the mailbox
  * keep decoding. Unknown transfer encodings quarantine the PART.
  *
  * Subset, honestly: charsets decode as UTF-8-else-Latin-1 (no ICU),
  * RFC 2231 parameter continuations and message/rfc822 recursion are
  * out (the latter surfaces as an opaque leaf part).
  *
  * Scale shape: one mailbox per row, message fan-out in
  * `mapPartitions` — bytes-linear, scan-local, no shuffle before the
  * caller's aggregate; an archive corpus parallelizes by mailbox file.
  */
object MimeWalk {

  final case class Part(
      contentType: String, // lowercased base type, e.g. "text/plain"
      ok: Boolean,
      text: String) // decoded when text/*, "" otherwise/failed

  final case class Message(
      idx: Int,
      from: String,
      subject: String,
      messageId: String,
      nParts: Int, // leaf parts
      corrupt: Boolean,
      textPlain: String) // all text/plain leaves joined with \n

  // ------------------------------------------------------------ decoding

  private def bytesToString(b: Array[Byte]): String =
    graft.functions.Text.decodeCharset(b) // shared front-door charset seam

  /** Quoted-printable per RFC 2045 §6.7: `=XX` escapes, `=` + EOL soft
    * breaks; bad escapes pass through literally (the tolerant reading).
    */
  private[operators] def decodeQp(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        if (n == '\n') i += 2 // soft break LF
        else if (n == '\r') i += (if (i + 2 < s.length && s.charAt(i + 2) == '\n') 3 else 2)
        else if (i + 2 < s.length &&
          Character.digit(n, 16) >= 0 && Character.digit(s.charAt(i + 2), 16) >= 0) {
          out.write(Character.digit(n, 16) * 16 + Character.digit(s.charAt(i + 2), 16))
          i += 3
        } else { out.write(c.toInt); i += 1 }
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  private[operators] def encodeQp(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var lineLen = 0
    for (b <- data) {
      val c = b & 0xff
      val tok =
        if (c == '\n') { sb.append('\n'); lineLen = 0; "" }
        else if (c >= 33 && c <= 126 && c != '=') c.toChar.toString
        else f"=${c}%02X"
      if (tok.nonEmpty) {
        if (lineLen + tok.length > 74) { sb.append("=\n"); lineLen = 0 }
        sb.append(tok); lineLen += tok.length
      }
    }
    sb.toString
  }

  private def decodeTransfer(body: String, encoding: String): Option[Array[Byte]] =
    encoding match {
      case "" | "7bit" | "8bit" | "binary" =>
        Some(body.getBytes("ISO-8859-1"))
      case "base64" =>
        try Some(java.util.Base64.getMimeDecoder.decode(body))
        catch { case _: Exception => None }
      case "quoted-printable" => Some(decodeQp(body))
      case _ => None // unknown encoding → part quarantine
    }

  /** RFC 2047 encoded words in a header value; adjacent encoded words
    * joined without the separating whitespace, plain runs kept.
    */
  private[operators] def decodeWords(v: String): String = {
    val re = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r
    val sb = new StringBuilder
    var last = 0
    var prevWasWord = false
    for (m <- re.findAllMatchIn(v)) {
      val between = v.substring(last, m.start)
      if (!(prevWasWord && between.trim.isEmpty)) sb.append(between)
      val payload = m.group(3)
      val bytes = m.group(2).toLowerCase match {
        case "b" =>
          try java.util.Base64.getMimeDecoder.decode(payload)
          catch { case _: Exception => payload.getBytes("ISO-8859-1") }
        case _ => decodeQp(payload.replace('_', ' '))
      }
      sb.append(bytesToString(bytes))
      last = m.end
      prevWasWord = true
    }
    sb.append(v.substring(last))
    sb.toString
  }

  // ------------------------------------------------------------- parsing

  /** Unfolded (name-lowercased → value) headers + body start offset
    * within `lines`; None when no blank-line separator exists.
    */
  private def splitHeaders(lines: Array[String]): Option[(Map[String, String], Int)] = {
    val hs = mutable.LinkedHashMap.empty[String, String]
    var i = 0
    var currentKey: String = null
    while (i < lines.length) {
      val line = lines(i)
      if (line.isEmpty) return Some((hs.toMap, i + 1))
      if ((line.startsWith(" ") || line.startsWith("\t")) && currentKey != null) {
        hs(currentKey) = hs(currentKey) + " " + line.trim
      } else {
        val c = line.indexOf(':')
        if (c <= 0) return Some((hs.toMap, i)) // header garbage: body here
        val k = line.substring(0, c).trim.toLowerCase
        val v = line.substring(c + 1).trim
        if (!hs.contains(k)) { hs(k) = v; currentKey = k }
        else currentKey = k // duplicate: first wins, continuations follow last
      }
      i += 1
    }
    Some((hs.toMap, lines.length)) // headers only, empty body
  }

  /** `Content-Type` → (base type lowercased, params). */
  private[operators] def contentType(v: String): (String, Map[String, String]) = {
    val parts = v.split(";").map(_.trim)
    val base = parts.headOption.getOrElse("").toLowerCase
    val params = parts.tail.flatMap { p =>
      val eq = p.indexOf('=')
      if (eq <= 0) None
      else {
        val k = p.substring(0, eq).trim.toLowerCase
        var vv = p.substring(eq + 1).trim
        if (vv.length >= 2 && vv.startsWith("\"") && vv.endsWith("\""))
          vv = vv.substring(1, vv.length - 1)
        Some(k -> vv)
      }
    }.toMap
    (base, params)
  }

  /** Recursive part decode: leaf parts for an entity (headers+body). */
  private def decodeEntity(
      headers: Map[String, String], bodyLines: Array[String],
      depth: Int): Option[Seq[Part]] = {
    val (ctype, params) = contentType(headers.getOrElse("content-type", "text/plain"))
    if (ctype.startsWith("multipart/") && depth < 8) {
      val boundary = params.getOrElse("boundary", "")
      if (boundary.isEmpty) return None
      val open = "--" + boundary
      val close = "--" + boundary + "--"
      val idxs = bodyLines.zipWithIndex.collect {
        case (l, i) if l == open || l == close => (i, l == close)
      }
      if (idxs.isEmpty) return None // declared boundary never occurs
      val cuts = idxs.map(_._1)
      val endIdx = idxs.find(_._2).map(_._1).getOrElse(bodyLines.length)
      val starts = cuts.filter(_ < endIdx).toSeq
      val ranges: Seq[(Int, Int)] =
        starts.zipAll(starts.drop(1), -1, endIdx)
          .collect { case (s, e) if s >= 0 => (s + 1, e) }
      val parts = ranges.map { case (s, e) =>
        val sub = bodyLines.slice(s, e)
        splitHeaders(sub) match {
          case Some((hs, bodyAt)) =>
            decodeEntity(hs, sub.drop(bodyAt), depth + 1)
          case None => None
        }
      }
      if (parts.exists(_.isEmpty)) None
      else Some(parts.flatMap(_.get))
    } else {
      val enc = headers.getOrElse("content-transfer-encoding", "").toLowerCase
      decodeTransfer(bodyLines.mkString("\n"), enc) match {
        case Some(bytes) =>
          val text = if (ctype.startsWith("text/")) bytesToString(bytes) else ""
          Some(Seq(Part(ctype, ok = true, text)))
        case None => Some(Seq(Part(ctype, ok = false, "")))
      }
    }
  }

  /** Parse one mbox payload into messages. */
  def parseMbox(bytes: Array[Byte]): Seq[Message] = {
    if (bytes == null || bytes.length == 0) return Seq.empty
    val text = new String(bytes, "ISO-8859-1").replace("\r\n", "\n")
    if (!text.startsWith("From ")) return Seq.empty
    val blocks = text.split("(?m)^From [^\n]*\n", -1).drop(1)
    blocks.zipWithIndex.map { case (block, idx) =>
      // mboxrd unquote: ^>+From  loses one >
      val lines = block.split("\n", -1)
        .map(l => if (l.matches("^>+From .*")) l.substring(1) else l)
      val bad = Message(idx, "", "", "", 0, corrupt = true, "")
      splitHeaders(lines) match {
        case Some((hs, bodyAt)) =>
          val from = decodeWords(hs.getOrElse("from", ""))
          val subject = decodeWords(hs.getOrElse("subject", ""))
          val mid = hs.getOrElse("message-id", "")
          decodeEntity(hs, lines.drop(bodyAt), 0) match {
            case Some(parts) =>
              // NOTE: the newline before each boundary is the
              // delimiter's (RFC 2046 §5.1.1) — line-splitting already
              // consumed it, so part text round-trips exactly
              val plain = parts.filter(p => p.ok && p.contentType == "text/plain")
                .map(_.text).mkString("\n")
              Message(idx, from, subject, mid, parts.length,
                corrupt = false, plain)
            case None => bad.copy(from = from, subject = subject, messageId = mid)
          }
        case None => bad
      }
    }.toSeq
  }

  // ------------------------------------------------------------ fixtures

  /** Serialize messages as an mbox. Each message: (from, subject,
    * textBody, html?) — html messages become multipart/alternative
    * with a quoted-printable text/plain part and a base64 text/html
    * part; plain messages are a single base64 text/plain body.
    * `breakBoundaryOf` declares a boundary that never occurs in that
    * message (the corrupt witness). Subjects are RFC 2047 B-encoded.
    */
  def fixture(
      msgs: Seq[(String, String, String, Boolean)],
      breakBoundaryOf: Set[Int] = Set.empty): Array[Byte] = {
    val sb = new StringBuilder
    val b64 = java.util.Base64.getMimeEncoder(72, "\n".getBytes)
    for (((from, subject, body, multi), i) <- msgs.zipWithIndex) {
      val encSubject = "=?utf-8?B?" +
        java.util.Base64.getEncoder.encodeToString(subject.getBytes("UTF-8")) + "?="
      sb.append(s"From $from Thu Jan  1 00:00:00 2026\n")
      sb.append(s"From: $from\n")
      sb.append(s"Subject: $encSubject\n")
      sb.append(s"Message-ID: <m$i@graft>\n")
      if (multi) {
        val bnd = s"==graft-$i=="
        val declared = if (breakBoundaryOf.contains(i)) s"==broken-$i==" else bnd
        sb.append(s"MIME-Version: 1.0\n")
        sb.append(s"Content-Type: multipart/alternative; boundary=\"$declared\"\n\n")
        sb.append(s"preamble ignored\n")
        sb.append(s"--$bnd\n")
        sb.append("Content-Type: text/plain; charset=utf-8\n")
        sb.append("Content-Transfer-Encoding: quoted-printable\n\n")
        // mboxrd-quote any "From " line the QP encoding leaves intact
        val qp = encodeQp(body.getBytes("UTF-8"))
          .split("\n", -1).map(l => if (l.matches("^>*From .*")) ">" + l else l)
          .mkString("\n")
        sb.append(qp).append('\n')
        sb.append(s"--$bnd\n")
        sb.append("Content-Type: text/html; charset=utf-8\n")
        sb.append("Content-Transfer-Encoding: base64\n\n")
        sb.append(b64.encodeToString(s"<p>${body.take(40)}</p>".getBytes("UTF-8")))
        sb.append('\n')
        sb.append(s"--$bnd--\n")
        sb.append("epilogue ignored\n")
      } else {
        sb.append("MIME-Version: 1.0\n")
        sb.append("Content-Type: text/plain; charset=utf-8\n")
        sb.append("Content-Transfer-Encoding: base64\n\n")
        sb.append(b64.encodeToString(body.getBytes("UTF-8"))).append('\n')
      }
      sb.append('\n')
    }
    sb.toString.getBytes("ISO-8859-1")
  }

  // ------------------------------------------------------------- Spark

  final case class MessageRow(
      doc_id: Long,
      msg_idx: Int,
      from: String,
      subject: String,
      n_parts: Int,
      corrupt: Boolean,
      text_plain: String)

  /** Partition-parallel message walk over (doc_id, payload). */
  def parseMessages(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[MessageRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMbox(bytes).map(m => MessageRow(id, m.idx, m.from, m.subject,
          m.nParts, m.corrupt, m.textPlain))
      })
  }
}
