package graft.operators

/** TAR archive walk (POSIX.1 ustar grammar + the two long-name
  * mechanisms every real corpus contains: GNU `L` name-data entries
  * and PAX `x` extended headers with `path` overrides) — the last of
  * the container front doors ([[Warc]], [[ZipWalk]], [[PdfCodec]],
  * [[MimeWalk]]): dataset dumps and code corpora ship as tarballs.
  *
  * Grammar: 512-byte blocks; header fields at their POSIX offsets
  * (name 0/100, size 124/12 octal, mtime 136/12 octal, chksum 148/8,
  * typeflag 156, magic 257/6, prefix 345/155); the checksum is the
  * byte sum of the header with the chksum field read as spaces —
  * verified for EVERY header; `prefix/name` joining; data in
  * ceil(size/512) blocks; two zero blocks end the archive (a single
  * zero block is tolerated, the GNU convention).
  *
  * Quarantine contract: a checksum-invalid header quarantines ONE
  * span and the walk RESYNCHRONIZES at the next checksum-valid
  * 512-aligned header (the [[Warc]] member-resync shape — data blocks
  * cannot validate by chance against a 17-bit sum). PAX `g` headers
  * are consumed like `x` (next-entry override — the honest subset;
  * true global state is not kept); non-file entries (dirs, links) are
  * surfaced with their typeflag, no data.
  *
  * Scale shape: one tarball per row inside `mapPartitions` —
  * bytes-linear, scan-local, zero shuffle before the caller's
  * aggregate.
  */
object Tar {

  final case class Entry(
      name: String, // null on a corrupt span
      typeflag: Char, // '0' file, '5' dir, ... ; '?' on corrupt
      size: Long,
      mtime: Long,
      corrupt: Boolean,
      data: Array[Byte]) // null for non-files / corrupt

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); i += 1 }
    v
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  /** Header checksum: byte sum with the chksum field as spaces. */
  private def checksumOk(b: Array[Byte], off: Int): Boolean = {
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' ' else b(off + i) & 0xff)
      i += 1
    }
    sum == octal(b, off + 148, 8) && sum > 0
  }

  private def zeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < 512) { if (b(off + i) != 0) return false; i += 1 }
    true
  }

  /** PAX extended-header records: `"<len> <key>=<value>\n"...`. */
  private[operators] def paxRecords(data: Array[Byte]): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var p = 0
    val s = new String(data, "UTF-8")
    while (p < s.length) {
      val sp = s.indexOf(' ', p)
      if (sp < 0) return out.toMap
      val len =
        try s.substring(p, sp).toInt
        catch { case _: Exception => return out.toMap }
      if (len <= 0 || p + len > s.length) return out.toMap
      val rec = s.substring(sp + 1, p + len - 1) // drop trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0) out(rec.substring(0, eq)) = rec.substring(eq + 1)
      p += len
    }
    out.toMap
  }

  /** Walk one tarball into entries. */
  def entries(bytes: Array[Byte]): Seq[Entry] = {
    if (bytes == null || bytes.length < 512) return Seq.empty
    val out = scala.collection.mutable.Buffer.empty[Entry]
    var pos = 0
    var pendingName: String = null // GNU 'L' / PAX path override
    while (pos + 512 <= bytes.length) {
      if (zeroBlock(bytes, pos)) {
        pos += 512 // end-of-archive (tolerate a single zero block)
      } else if (!checksumOk(bytes, pos)) {
        // corrupt span: ONE quarantine row, resync at the next
        // checksum-valid 512-aligned header
        var n = pos + 512
        while (n + 512 <= bytes.length && !zeroBlock(bytes, n) &&
          !checksumOk(bytes, n)) n += 512
        out += Entry(null, '?', -1L, -1L, corrupt = true, null)
        pos = n
      } else {
        val rawName = str(bytes, pos, 100)
        val prefix = str(bytes, pos + 345, 155)
        val size = octal(bytes, pos + 124, 12)
        val mtime = octal(bytes, pos + 136, 12)
        val tf = (bytes(pos + 156) & 0xff).toChar
        val dataBlocks = ((size + 511) / 512).toInt
        val dataStart = pos + 512
        val dataEnd = dataStart + size
        val ok = dataEnd <= bytes.length
        tf match {
          case 'L' => // GNU long name: data is the NEXT entry's name
            if (ok) pendingName = new String(bytes, dataStart, size.toInt, "UTF-8")
              .takeWhile(_ != 0)
          case 'x' | 'g' => // PAX extended header: path override
            if (ok) {
              val recs = paxRecords(java.util.Arrays.copyOfRange(
                bytes, dataStart, dataEnd.toInt))
              recs.get("path").foreach(p => pendingName = p)
            }
          case _ =>
            val name =
              if (pendingName != null) pendingName
              else if (prefix.nonEmpty) prefix + "/" + rawName
              else rawName
            pendingName = null
            val isFile = tf == '0' || tf == 0.toChar
            if (!ok)
              out += Entry(name, tf, size, mtime, corrupt = true, null)
            else
              out += Entry(name, if (tf == 0.toChar) '0' else tf, size, mtime,
                corrupt = false,
                if (isFile) java.util.Arrays.copyOfRange(
                  bytes, dataStart, dataEnd.toInt) else null)
        }
        pos = dataStart + dataBlocks * 512
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------ fixtures

  /** Serialize (name, data) files as a POSIX ustar tarball with real
    * checksums; names > 100 chars go through a GNU `L` entry.
    * `corruptChksumOf` XOR-flips a checksum digit of that file's
    * header — the quarantine-and-resync witness. `mtimeOf` supplies
    * deterministic per-entry mtimes.
    */
  def fixture(
      files: Seq[(String, Array[Byte])],
      corruptChksumOf: Set[Int] = Set.empty,
      mtimeOf: Int => Long = _ => 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def header(name: String, size: Long, mtime: Long, tf: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes("UTF-8"), 0, h, off, len - 1)
        h(off + len - 1) = 0
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8)
      oct(size, 124, 12)
      oct(mtime, 136, 12)
      h(156) = tf.toByte
      System.arraycopy("ustar".getBytes, 0, h, 257, 5)
      h(263) = '0'; h(264) = '0'
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      for (i <- 0 until 512) sum += h(i) & 0xff
      val cs = java.lang.Long.toOctalString(sum)
      val padded = ("0" * (6 - cs.length)) + cs
      System.arraycopy(padded.getBytes, 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      h
    }
    def writeData(data: Array[Byte]): Unit = {
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    for (((name, data), i) <- files.zipWithIndex) {
      if (name.getBytes("UTF-8").length > 100) {
        val nb = name.getBytes("UTF-8")
        out.write(header("././@LongLink", nb.length.toLong, 0L, 'L'))
        writeData(nb)
      }
      val h = header(name.take(100), data.length.toLong, mtimeOf(i), '0')
      if (corruptChksumOf.contains(i)) h(149) = (h(149) ^ 0x07).toByte
      out.write(h)
      writeData(data)
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark

  final case class EntryRow(
      doc_id: Long,
      name: String,
      typeflag: String,
      size: Long,
      mtime: Long,
      corrupt: Boolean,
      body_text: String)

  /** Partition-parallel entry walk over (doc_id, payload). */
  def parseEntries(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[EntryRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        entries(bytes).map(e => EntryRow(id, e.name, e.typeflag.toString,
          e.size, e.mtime, e.corrupt,
          if (e.data == null) null else graft.functions.Text.decodeCharset(e.data)))
      })
  }
}
