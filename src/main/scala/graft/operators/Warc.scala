package graft.operators

/** WARC/1.0 ingestion front door (ISO 28500 record grammar + RFC 1952
  * gzip members) — the shape 100 TB of crawled text actually arrives
  * in: a `.warc.gz` file is a CONCATENATION of gzip members, one WARC
  * record per member (the CommonCrawl convention — that is what makes
  * a petabyte splittable: member boundaries are record boundaries).
  * This walks members with the JDK's raw `Inflater` (REAL decompression
  * — CRC-32 and ISIZE verified per RFC 1952 §2.3.1), parses each
  * record's WARC headers (version line, named headers, Content-Length,
  * the CRLF CRLF separators), and yields typed records; a corrupt or
  * truncated member quarantines THAT record and resynchronizes at the
  * next member boundary rather than poisoning the file — the
  * [[RawIngest]] corrupt-tolerance contract at the container level.
  *
  * Subset, honestly: gzip members with FTEXT/FEXTRA/FNAME/FCOMMENT
  * flags are handled, FHCRC is not (return as corrupt — the flag is
  * essentially extinct); uncompressed (plain `.warc`) input is
  * accepted when the payload does not start with the gzip magic.
  */
object Warc {

  final case class Record(
      offset: Long, // byte offset of the record's gzip member (or record)
      warcType: String,
      targetUri: String, // "" when absent
      contentLength: Long,
      body: Array[Byte],
      corrupt: Boolean)

  private val GzMagic0 = 0x1f.toByte
  private val GzMagic1 = 0x8b.toByte

  /** Split a multi-member gzip stream at member boundaries, inflating
    * and CRC/ISIZE-checking each member. Returns (offset, bytes | null
    * if corrupt) per member; a corrupt member consumes the rest of the
    * stream only if no later gzip magic resynchronizes it.
    */
  private[operators] def gzipMembers(bytes: Array[Byte]): Seq[(Long, Array[Byte])] = {
    val out = scala.collection.mutable.Buffer.empty[(Long, Array[Byte])]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      inflateMember(bytes, pos) match {
        case Some((data, next)) =>
          out += ((start.toLong, data))
          pos = next
        case None =>
          // resynchronize at the next VALID member (magic alone is not
          // enough — deflate bytes inside the corrupt span can contain
          // 1f 8b by chance, and stopping there would fabricate extra
          // quarantine rows); the whole bad span is ONE corrupt record.
          // Validation re-inflates the found member once — corrupt
          // spans are the rare path, the double-pay is bounded by them
          var n = pos + 1
          var next = bytes.length
          while (next == bytes.length && n < bytes.length - 1) {
            if (bytes(n) == GzMagic0 && bytes(n + 1) == GzMagic1 &&
              inflateMember(bytes, n).isDefined) next = n
            n += 1
          }
          out += ((start.toLong, null))
          pos = next
      }
    }
    out.toSeq
  }

  /** One RFC 1952 member at `pos`: Some((inflated, nextPos)) or None.
    * Package-visible: [[Codecs]] reuses it as the gzip leg of the
    * format-sniffing mixed-corpus walk.
    */
  private[operators] def inflateMember(b: Array[Byte], pos: Int): Option[(Array[Byte], Int)] = {
    try {
      if (b.length - pos < 18) return None // header + trailer minimum
      if (!(b(pos) == GzMagic0 && b(pos + 1) == GzMagic1)) return None
      if (b(pos + 2) != 8) return None // CM must be deflate
      val flg = b(pos + 3) & 0xff
      if ((flg & 0x02) != 0) return None // FHCRC out of subset
      var p = pos + 10 // skip mtime/xfl/os
      if ((flg & 0x04) != 0) { // FEXTRA
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 0x08) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 0x10) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, p, b.length - p)
      val chunks = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) { inf.end(); return None } // truncated
        chunks.write(buf, 0, n)
      }
      val consumed = p + inf.getBytesRead.toInt
      inf.end()
      if (b.length - consumed < 8) return None // missing trailer
      val data = chunks.toByteArray
      def le32(i: Int): Long =
        ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      if (crc.getValue != le32(consumed)) return None
      if ((data.length.toLong & 0xFFFFFFFFL) != le32(consumed + 4)) return None
      Some((data, consumed + 8))
    } catch { case _: Exception => None }
  }

  /** Parse ONE uncompressed WARC record at the head of `data`. */
  private def parseRecord(offset: Long, data: Array[Byte]): Record = {
    val bad = Record(offset, "", "", -1L, Array.emptyByteArray, corrupt = true)
    try {
      val text = new String(data, "ISO-8859-1") // headers are ASCII; body sliced by bytes
      if (!text.startsWith("WARC/1.0\r\n") && !text.startsWith("WARC/1.1\r\n"))
        return bad
      val headEnd = text.indexOf("\r\n\r\n")
      if (headEnd < 0) return bad
      val headers = text.substring(text.indexOf("\r\n") + 2, headEnd)
        .split("\r\n").iterator
        .map(_.split(":", 2))
        .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
        .toMap
      val len = headers.get("content-length").map(_.toLong).getOrElse(-1L)
      if (len < 0 || headEnd + 4 + len > data.length) return bad
      Record(offset,
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-target-uri", ""),
        len,
        java.util.Arrays.copyOfRange(data, headEnd + 4, (headEnd + 4 + len).toInt),
        corrupt = false)
    } catch { case _: Exception => bad }
  }

  /** Walk a `.warc.gz` (or plain `.warc`) payload into records. Gzipped
    * input yields one record per member (corrupt members quarantine as
    * corrupt records at their offset); plain input splits on the WARC
    * version line after each record's declared length.
    */
  def records(bytes: Array[Byte]): Seq[Record] = {
    if (bytes == null || bytes.length == 0) return Seq.empty
    if (bytes.length >= 2 && bytes(0) == GzMagic0 && bytes(1) == GzMagic1) {
      gzipMembers(bytes).map {
        case (off, null) => Record(off, "", "", -1L, Array.emptyByteArray, corrupt = true)
        case (off, data) => parseRecord(off, data)
      }
    } else {
      // plain concatenation: records self-describe via Content-Length,
      // each followed by CRLF CRLF
      val out = scala.collection.mutable.Buffer.empty[Record]
      var pos = 0
      while (pos < bytes.length) {
        val rec = parseRecord(pos.toLong,
          java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
        out += rec
        if (rec.corrupt) return out.toSeq // no member boundary to resync at
        val text = new String(bytes, pos, math.min(bytes.length - pos, 8192), "ISO-8859-1")
        val headEnd = text.indexOf("\r\n\r\n")
        pos += headEnd + 4 + rec.contentLength.toInt + 4 // body + CRLF CRLF
      }
      out.toSeq
    }
  }

  // ------------------------------------------------------------- fixtures

  /** Serialize (uri, warcType, body) triples as a CommonCrawl-shaped
    * `.warc.gz`: one record per gzip member (JDK GZIPOutputStream per
    * member, real deflate). `corruptAt` truncates that member's bytes
    * mid-stream — provably unparseable, CRC-gated.
    */
  def fixtureGz(
      recs: Seq[(String, String, Array[Byte])],
      corruptAt: Set[Int] = Set.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.zipWithIndex.foreach { case ((uri, wtype, body), i) =>
      val rec = new java.io.ByteArrayOutputStream()
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $wtype\r\n")
      if (uri.nonEmpty) head.append(s"WARC-Target-URI: $uri\r\n")
      head.append(s"Content-Length: ${body.length}\r\n\r\n")
      rec.write(head.toString.getBytes("ISO-8859-1"))
      rec.write(body)
      rec.write("\r\n\r\n".getBytes("ISO-8859-1"))
      val member = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(member)
      gz.write(rec.toByteArray); gz.close()
      val bytes = member.toByteArray
      if (corruptAt.contains(i))
        out.write(bytes, 0, math.max(12, bytes.length - 9)) // kill trailer+tail
      else out.write(bytes)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark

  final case class RecordRow(
      doc_id: Long,
      offset: Long,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      body_text: String,
      corrupt: Boolean)

  /** Partition-parallel record walk over (doc_id, payload) — the
    * splittable-ingest shape: at deployment scale the payload column
    * holds one ranged chunk per row (split at gzip member boundaries,
    * which this walk resynchronizes on), so a petabyte of WARC fans
    * out without any record crossing a task.
    */
  def parseRecords(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[RecordRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        records(bytes).map(r => RecordRow(id, r.offset, r.warcType,
          r.targetUri, r.contentLength,
          graft.functions.Text.decodeCharset(r.body), r.corrupt))
      })
  }
}
