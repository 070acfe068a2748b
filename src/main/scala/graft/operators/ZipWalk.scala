package graft.operators

/** ZIP archive ingestion front door (PKWARE APPNOTE.TXT grammar, the
  * container EPUB/DOCX/XLSX/JAR corpora arrive in). The walk is
  * CENTRAL-DIRECTORY-driven — the end-of-central-directory record is
  * located by a bounded backward scan (comment-tolerant), each central
  * header yields name/method/sizes/CRC/local offset, and extraction
  * re-reads the LOCAL header only for its name/extra lengths (local
  * size/CRC fields are zero under the bit-3 data-descriptor convention
  * — the central values are authoritative, so descriptor-written
  * archives walk identically). Stored (method 0) and deflate (method 8,
  * raw JDK `Inflater`) entries decode; every decoded entry is gated on
  * the central CRC-32 AND the declared uncompressed size.
  *
  * Corruption contract (the [[Warc]] / [[RawIngest]] quarantine shape):
  * a broken EOCD / central walk quarantines the ARCHIVE as one corrupt
  * row; a broken entry (bad local magic, CRC/size mismatch, truncated
  * deflate stream, out-of-range data span) quarantines THAT entry and
  * the walk continues with the rest of the directory.
  *
  * ZIP64 (APPNOTE 4.5): when EOCD fields carry the 0xFFFF/0xFFFFFFFF
  * sentinels, the walk follows the ZIP64 EOCD LOCATOR (PK\x06\x07,
  * the 20 bytes preceding the EOCD) to the ZIP64 EOCD RECORD
  * (PK\x06\x06) for the real count/size/offset, and a central header
  * whose size/offset fields are saturated reads the 0x0001 extra
  * field's 8-byte values in APPNOTE order (usize, csize, localOff —
  * only the saturated ones are present). Bulk corpus archives exceed
  * 4 GiB routinely; this front door accepts them. (A single IN-MEMORY
  * payload row still caps at the JVM's 2 GiB array bound — the walk
  * validates ZIP64 structure and serves every span that fits the
  * buffer; larger archives arrive through a ranged file source.)
  *
  * Subset, honestly: encrypted entries (general-purpose bit 0) are
  * surfaced with `encrypted = true`, data withheld, NOT corrupt;
  * spanned/multi-disk archives return the archive-level corrupt row
  * — out of subset, loud.
  *
  * Scale shape: one archive per row, entry fan-out inside
  * `mapPartitions` — bytes-linear, scan-local, no shuffle before the
  * caller's aggregate; a petabyte of containers parallelizes by file.
  */
object ZipWalk {

  final case class Entry(
      name: String, // null on the archive-level corrupt row
      method: Int, // -1 when unknown
      compressedSize: Long,
      uncompressedSize: Long,
      encrypted: Boolean,
      data: Array[Byte], // null when withheld (encrypted) or corrupt
      corrupt: Boolean)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  private val ArchiveCorrupt =
    Seq(Entry(null, -1, -1L, -1L, encrypted = false, null, corrupt = true))

  /** Walk one ZIP payload into entries (archive-level corrupt row on a
    * broken container; per-entry corrupt rows on broken members).
    */
  def entries(bytes: Array[Byte]): Seq[Entry] = {
    if (bytes == null || bytes.length < 22) return ArchiveCorrupt
    try {
      // EOCD: PK\x05\x06 + 18 fixed bytes + comment; scan backwards
      // through the largest legal comment (65535 bytes)
      var eocd = -1
      var i = bytes.length - 22
      val stop = math.max(0, bytes.length - 22 - 65535)
      while (eocd < 0 && i >= stop) {
        if (bytes(i) == 0x50 && bytes(i + 1) == 0x4b &&
          bytes(i + 2) == 0x05 && bytes(i + 3) == 0x06 &&
          i + 22 + le16(bytes, i + 20) == bytes.length) eocd = i
        i -= 1
      }
      if (eocd < 0) return ArchiveCorrupt
      val diskNum = le16(bytes, eocd + 4)
      val cdDisk = le16(bytes, eocd + 6)
      val nHere = le16(bytes, eocd + 8)
      var nTotal = le16(bytes, eocd + 10).toLong
      var cdSize = le32(bytes, eocd + 12)
      var cdOff = le32(bytes, eocd + 16)
      if (diskNum != 0 || cdDisk != 0 || nHere != nTotal) return ArchiveCorrupt // spanned
      val saturated = nTotal == 0xFFFFL || cdOff == 0xFFFFFFFFL ||
        cdSize == 0xFFFFFFFFL
      if (saturated) {
        // ZIP64: the 20-byte EOCD locator sits immediately before the
        // EOCD; follow it to the ZIP64 EOCD record for the real values
        val loc = eocd - 20
        if (loc < 0 || !(bytes(loc) == 0x50 && bytes(loc + 1) == 0x4b &&
          bytes(loc + 2) == 0x06 && bytes(loc + 3) == 0x07)) return ArchiveCorrupt
        if (le32(bytes, loc + 4) != 0L || le32(bytes, loc + 16) != 1L)
          return ArchiveCorrupt // multi-disk
        val r64 = le64(bytes, loc + 8)
        if (r64 < 0 || r64 > loc - 56) return ArchiveCorrupt
        val r = r64.toInt
        if (!(bytes(r) == 0x50 && bytes(r + 1) == 0x4b &&
          bytes(r + 2) == 0x06 && bytes(r + 3) == 0x06)) return ArchiveCorrupt
        if (le32(bytes, r + 16) != 0L || le32(bytes, r + 20) != 0L)
          return ArchiveCorrupt // spanned
        if (le64(bytes, r + 24) != le64(bytes, r + 32)) return ArchiveCorrupt
        nTotal = le64(bytes, r + 32)
        cdSize = le64(bytes, r + 40)
        cdOff = le64(bytes, r + 48)
      }
      val cdEnd = if (saturated) eocd - 20 else eocd
      if (cdOff < 0 || cdSize < 0 || cdOff + cdSize > cdEnd) return ArchiveCorrupt
      if (cdOff > Int.MaxValue || nTotal > Int.MaxValue) return ArchiveCorrupt

      val out = scala.collection.mutable.Buffer.empty[Entry]
      var p = cdOff.toInt
      var k = 0L
      while (k < nTotal) {
        if (p + 46 > cdEnd || !(bytes(p) == 0x50 && bytes(p + 1) == 0x4b &&
          bytes(p + 2) == 0x01 && bytes(p + 3) == 0x02)) return ArchiveCorrupt
        val flags = le16(bytes, p + 8)
        val method = le16(bytes, p + 10)
        val crc = le32(bytes, p + 16)
        var csize = le32(bytes, p + 20)
        var usize = le32(bytes, p + 24)
        val nameLen = le16(bytes, p + 28)
        val extraLen = le16(bytes, p + 30)
        val commentLen = le16(bytes, p + 32)
        var localOff = le32(bytes, p + 42)
        if (csize == 0xFFFFFFFFL || usize == 0xFFFFFFFFL ||
          localOff == 0xFFFFFFFFL) {
          // ZIP64 extended-information extra field (id 0x0001): 8-byte
          // values in APPNOTE order, PRESENT ONLY for saturated fields
          var q = p + 46 + nameLen
          val qEnd = q + extraLen
          var found = false
          while (!found && q + 4 <= qEnd) {
            val id = le16(bytes, q)
            val len = le16(bytes, q + 2)
            if (q + 4 + len > qEnd) return ArchiveCorrupt
            if (id == 0x0001) {
              var v = q + 4
              if (usize == 0xFFFFFFFFL) {
                if (v + 8 > q + 4 + len) return ArchiveCorrupt
                usize = le64(bytes, v); v += 8
              }
              if (csize == 0xFFFFFFFFL) {
                if (v + 8 > q + 4 + len) return ArchiveCorrupt
                csize = le64(bytes, v); v += 8
              }
              if (localOff == 0xFFFFFFFFL) {
                if (v + 8 > q + 4 + len) return ArchiveCorrupt
                localOff = le64(bytes, v); v += 8
              }
              found = true
            }
            q += 4 + len
          }
          if (!found) return ArchiveCorrupt // sentinel with no 0x0001 field
        }
        val name = new String(bytes, p + 46, nameLen, "UTF-8")
        val encrypted = (flags & 0x01) != 0
        out += readEntry(bytes, name, method, crc, csize, usize,
          localOff, encrypted)
        p += 46 + nameLen + extraLen + commentLen
        k += 1
      }
      out.toSeq
    } catch { case _: Exception => ArchiveCorrupt }
  }

  /** One entry via its local header; central values authoritative. */
  private def readEntry(
      b: Array[Byte], name: String, method: Int, crc: Long,
      csize: Long, usize: Long, localOff: Long,
      encrypted: Boolean): Entry = {
    val bad = Entry(name, method, csize, usize, encrypted, null, corrupt = true)
    try {
      // a ZIP64 span that exceeds the in-memory 2 GiB array bound is
      // entry-corrupt for THIS buffered row, not archive-corrupt
      if (localOff < 0 || localOff > Int.MaxValue ||
        csize < 0 || csize > Int.MaxValue) return bad
      val lo = localOff.toInt
      if (lo + 30 > b.length || !(b(lo) == 0x50 && b(lo + 1) == 0x4b &&
        b(lo + 2) == 0x03 && b(lo + 3) == 0x04)) return bad
      val dataStart = lo + 30 + le16(b, lo + 26) + le16(b, lo + 28)
      if (dataStart + csize > b.length) return bad
      if (encrypted) // surfaced, data withheld, NOT corrupt
        return Entry(name, method, csize, usize, encrypted = true, null,
          corrupt = false)
      val data: Array[Byte] = method match {
        case 0 =>
          if (csize != usize) return bad
          java.util.Arrays.copyOfRange(b, dataStart, dataStart + csize.toInt)
        case 8 =>
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(b, dataStart, csize.toInt)
          val chunks = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 16)
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
              inf.end(); return bad // truncated / preset-dictionary
            }
            chunks.write(buf, 0, n)
          }
          inf.end()
          chunks.toByteArray
        case _ => return bad // bzip2/lzma/etc out of subset → entry-corrupt
      }
      if (data.length.toLong != usize) return bad
      val c = new java.util.zip.CRC32()
      c.update(data)
      if (c.getValue != crc) return bad
      Entry(name, method, csize, usize, encrypted = false, data,
        corrupt = false)
    } catch { case _: Exception => bad }
  }

  // ------------------------------------------------------------- fixtures

  /** Serialize (name, data, deflate?) triples as a classic ZIP (local
    * headers + central directory + EOCD, real CRC-32, real JDK deflate).
    * `corruptCrcAt` XOR-flips a byte of that entry's CENTRAL crc field —
    * structurally intact, CRC-gated on decode (the quarantine witness).
    */
  def fixture(
      entriesIn: Seq[(String, Array[Byte], Boolean)],
      corruptCrcAt: Set[Int] = Set.empty,
      comment: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    final case class Meta(name: Array[Byte], method: Int, crc: Long,
      csize: Int, usize: Int, off: Int)
    val metas = entriesIn.map { case (name, data, deflate) =>
      val nameB = name.getBytes("UTF-8")
      val c = new java.util.zip.CRC32(); c.update(data)
      val packed =
        if (deflate) {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val tmp = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 16)
          while (!d.finished()) tmp.write(buf, 0, d.deflate(buf))
          d.end(); tmp.toByteArray
        } else data
      val off = out.size()
      val h = java.nio.ByteBuffer.allocate(30)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(0x04034b50).putShort(20.toShort).putShort(0.toShort)
        .putShort((if (deflate) 8 else 0).toShort).putShort(0.toShort).putShort(0x2921.toShort)
        .putInt(c.getValue.toInt).putInt(packed.length).putInt(data.length)
        .putShort(nameB.length.toShort).putShort(0)
      out.write(h.array()); out.write(nameB); out.write(packed)
      Meta(nameB, if (deflate) 8 else 0, c.getValue, packed.length,
        data.length, off)
    }
    val cdStart = out.size()
    metas.zipWithIndex.foreach { case (m, i) =>
      val crc = if (corruptCrcAt.contains(i)) m.crc ^ 0x5aL else m.crc
      val h = java.nio.ByteBuffer.allocate(46)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(0x02014b50).putShort(20).putShort(20.toShort).putShort(0.toShort)
        .putShort(m.method.toShort).putShort(0.toShort).putShort(0x2921.toShort)
        .putInt(crc.toInt).putInt(m.csize).putInt(m.usize)
        .putShort(m.name.length.toShort).putShort(0.toShort).putShort(0.toShort)
        .putShort(0.toShort).putShort(0.toShort).putInt(0).putInt(m.off)
      out.write(h.array()); out.write(m.name)
    }
    val cdSize = out.size() - cdStart
    val e = java.nio.ByteBuffer.allocate(22)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    e.putInt(0x06054b50).putShort(0.toShort).putShort(0.toShort)
      .putShort(metas.length.toShort).putShort(metas.length.toShort)
      .putInt(cdSize).putInt(cdStart).putShort(comment.length.toShort)
    out.write(e.array()); out.write(comment)
    out.toByteArray
  }

  /** Serialize entries as a FORCED-ZIP64 archive: every central header
    * saturates usize/csize/localOff to 0xFFFFFFFF and carries the real
    * values in a 0x0001 extra field; the EOCD saturates count/size/
    * offset and a ZIP64 EOCD record + locator precede it — the small-
    * archive-with-64-bit-fields shape zip64 writers emit, so the walk's
    * indirection is testable without a real >4 GiB payload.
    */
  def fixture64(entriesIn: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    final case class Meta(name: Array[Byte], method: Int, crc: Long,
      csize: Int, usize: Int, off: Int)
    val metas = entriesIn.map { case (name, data, deflate) =>
      val nameB = name.getBytes("UTF-8")
      val c = new java.util.zip.CRC32(); c.update(data)
      val packed =
        if (deflate) {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val tmp = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 16)
          while (!d.finished()) tmp.write(buf, 0, d.deflate(buf))
          d.end(); tmp.toByteArray
        } else data
      val off = out.size()
      val h = java.nio.ByteBuffer.allocate(30)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(0x04034b50).putShort(45.toShort).putShort(0.toShort)
        .putShort((if (deflate) 8 else 0).toShort).putShort(0.toShort)
        .putShort(0x2921.toShort)
        .putInt(c.getValue.toInt).putInt(packed.length).putInt(data.length)
        .putShort(nameB.length.toShort).putShort(0)
      out.write(h.array()); out.write(nameB); out.write(packed)
      Meta(nameB, if (deflate) 8 else 0, c.getValue, packed.length,
        data.length, off)
    }
    val cdStart = out.size()
    metas.foreach { m =>
      // 0x0001 extra: usize + csize + localOff, all forced
      val h = java.nio.ByteBuffer.allocate(46)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(0x02014b50).putShort(45).putShort(45.toShort).putShort(0.toShort)
        .putShort(m.method.toShort).putShort(0.toShort).putShort(0x2921.toShort)
        .putInt(m.crc.toInt).putInt(-1).putInt(-1) // 0xFFFFFFFF sentinels
        .putShort(m.name.length.toShort).putShort(28.toShort).putShort(0.toShort)
        .putShort(0.toShort).putShort(0.toShort).putInt(0).putInt(-1)
      out.write(h.array()); out.write(m.name)
      val x = java.nio.ByteBuffer.allocate(28)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      x.putShort(1.toShort).putShort(24.toShort)
        .putLong(m.usize.toLong).putLong(m.csize.toLong).putLong(m.off.toLong)
      out.write(x.array())
    }
    val cdSize = out.size() - cdStart
    val r64 = out.size()
    val rec = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    rec.putInt(0x06064b50).putLong(44L).putShort(45.toShort).putShort(45.toShort)
      .putInt(0).putInt(0).putLong(metas.length.toLong).putLong(metas.length.toLong)
      .putLong(cdSize.toLong).putLong(cdStart.toLong)
    out.write(rec.array())
    val loc = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    loc.putInt(0x07064b50).putInt(0).putLong(r64.toLong).putInt(1)
    out.write(loc.array())
    val e = java.nio.ByteBuffer.allocate(22)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    e.putInt(0x06054b50).putShort(0.toShort).putShort(0.toShort)
      .putShort(-1).putShort(-1) // 0xFFFF sentinels
      .putInt(-1).putInt(-1).putShort(0.toShort)
    out.write(e.array())
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark

  final case class EntryRow(
      doc_id: Long,
      name: String,
      method: Int,
      compressed_size: Long,
      uncompressed_size: Long,
      encrypted: Boolean,
      corrupt: Boolean,
      body_text: String) // null when withheld/corrupt

  /** Partition-parallel entry walk over (doc_id, payload). */
  def parseEntries(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[EntryRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        entries(bytes).map(en => EntryRow(id, en.name, en.method,
          en.compressedSize, en.uncompressedSize, en.encrypted, en.corrupt,
          if (en.data == null) null else graft.functions.Text.decodeCharset(en.data)))
      })
  }
}
