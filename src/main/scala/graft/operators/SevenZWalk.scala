package graft.operators

/** 7z archive walk (the public `7zFormat.txt` grammar — the other
  * container bulk corpora and scraped software mirrors routinely ship
  * in, alongside [[ZipWalk]] and [[Tar]]). From-spec, pure Scala:
  *
  *  - signature header: 6-byte magic + version + CRC32-gated start
  *    header (next-header offset/size/CRC — BOTH CRCs verified);
  *  - the variable-length REAL_UINT64 number encoding (leading-ones
  *    mask byte, little-endian tail);
  *  - `kHeader` property tree: `kMainStreamsInfo` (PackInfo sizes +
  *    CRCs, UnpackInfo folders — coder flags, method ids, properties,
  *    bind pairs — CodersUnpackSize, folder CRCs), `kSubStreamsInfo`
  *    (per-folder stream splits, derived last sizes, substream CRCs),
  *    `kFilesInfo` (EmptyStream/EmptyFile bitfields, UTF-16LE
  *    NUL-terminated names, sized skip of every other property);
  *  - `kEncodedHeader`: the header itself packed as a one-folder
  *    stream — decoded with the same folder machinery, then re-parsed
  *    (the layout 7-Zip writes by default for multi-file archives);
  *  - coders: Copy (0x00), LZMA2 (0x21, via [[XzCodec.lzma2]] — the
  *    packed stream is exactly the raw chunk grammar xz blocks carry),
  *    classic LZMA1 (0x030101, via [[XzCodec.lzma1]] — the coder
  *    real `7z a` uses for encoded headers), and the branch filters
  *    x86 BCJ (0x03030103) and Delta (0x03) — decoded through the
  *    folder's bind-pair graph, so the filter+LZMA two-coder chains
  *    `7z a` emits for executables decode end-to-end. Multi-input
  *    coders (BCJ2) and encrypted folders quarantine their files with
  *    names kept (honest subset).
  *
  * Quarantine contract ([[ZipWalk]]'s shape): a folder that fails to
  * decode or misses its CRC quarantines ITS files only; the walk keeps
  * all other folders. A broken signature/header quarantines the
  * archive as one row.
  *
  * Scale shape: one archive per row inside `mapPartitions` —
  * bytes-linear, scan-local, zero shuffle before the caller's
  * aggregate.
  */
object SevenZWalk {

  final case class Entry(
      name: String, // null on an archive-level quarantine
      size: Long,
      crcOk: Boolean,
      corrupt: Boolean,
      emptyStream: Boolean,
      isDir: Boolean, // kEmptyStream entry NOT marked kEmptyFile
      data: Array[Byte]) // null when corrupt or empty

  // ------------------------------------------------------------ numbers

  private final class Cursor(val b: Array[Byte], var p: Int, val end: Int) {
    def u8(): Int = { require(p < end, "7z: truncated"); val v = b(p) & 0xff; p += 1; v }
    def bytes(n: Int): Array[Byte] = {
      require(p + n <= end, "7z: truncated run")
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    def skip(n: Long): Unit = { require(n >= 0 && p + n <= end, "7z: bad skip"); p += n.toInt }
    /** REAL_UINT64: leading-ones mask byte + little-endian tail. */
    def num(): Long = {
      val first = u8()
      var mask = 0x80
      var value = 0L
      var i = 0
      while (i < 8) {
        if ((first & mask) == 0) {
          return value | ((first & (mask - 1)).toLong << (8 * i))
        }
        value |= (u8().toLong << (8 * i))
        mask >>= 1
        i += 1
      }
      value
    }
    def u32le(): Long = {
      require(p + 4 <= end, "7z: truncated u32")
      val v = ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      p += 4; v
    }
  }

  /** Plain bit vector (MSB-first bytes) — the raw form kEmptyStream /
    * kEmptyFile use.
    */
  private def bitVector(c: Cursor, n: Int): Array[Boolean] = {
    val out = new Array[Boolean](n)
    var mask = 0; var cur = 0
    var i = 0
    while (i < n) {
      if (mask == 0) { cur = c.u8(); mask = 0x80 }
      out(i) = (cur & mask) != 0
      mask >>= 1
      i += 1
    }
    out
  }

  /** AllAreDefined-prefixed bit vector — the digest form (kCrc). */
  private def boolVector(c: Cursor, n: Int): Array[Boolean] =
    if (c.u8() != 0) Array.fill(n)(true) else bitVector(c, n)

  // ------------------------------------------------------------- model

  private final case class Coder(id: Long, props: Array[Byte], nIn: Int, nOut: Int)
  private final case class Folder(coders: Seq[Coder], outSizes: Seq[Long],
      crc: Option[Long], numPacked: Int,
      bindPairs: Seq[(Int, Int)]) // (global inIndex, global outIndex)

  private final case class Streams(
      packPos: Long,
      packSizes: Seq[Long],
      folders: Seq[Folder],
      // per folder: substream sizes and CRCs (None when undefined)
      subSizes: Seq[Seq[Long]],
      subCrcs: Seq[Seq[Option[Long]]])

  private val IdCopy = 0x00L
  private val IdLzma2 = 0x21L
  private val IdLzma1 = 0x030101L
  private val IdDelta = 0x03L
  private val IdBcjX86 = 0x03030103L

  private val K = new {
    val End = 0x00; val Header = 0x01; val ArchiveProps = 0x02
    val MainStreams = 0x04; val FilesInfo = 0x05
    val PackInfo = 0x06; val UnpackInfo = 0x07; val SubStreams = 0x08
    val Size = 0x09; val Crc = 0x0a; val Folder = 0x0b; val UnpackSize = 0x0c
    val NumUnpack = 0x0d; val EmptyStream = 0x0e; val EmptyFile = 0x0f
    val Name = 0x11; val EncodedHeader = 0x17
  }

  // ------------------------------------------------------- streams info

  private def readStreamsInfo(c: Cursor): Streams = {
    var packPos = 0L
    var packSizes: Seq[Long] = Nil
    var folders: Seq[Folder] = Nil
    var numUnpack: Seq[Int] = Nil
    var subSizes: Seq[Seq[Long]] = Nil
    var subCrcs: Seq[Seq[Option[Long]]] = Nil
    var id = c.num().toInt
    if (id == K.PackInfo) {
      packPos = c.num()
      val n = c.num().toInt
      var t = c.num().toInt
      while (t != K.End) {
        if (t == K.Size) packSizes = Seq.fill(n)(c.num())
        else if (t == K.Crc) {
          val defined = boolVector(c, n)
          defined.foreach(d => if (d) c.u32le())
        } else c.skip(c.num())
        t = c.num().toInt
      }
      id = c.num().toInt
    }
    if (id == K.UnpackInfo) {
      var t = c.num().toInt
      require(t == K.Folder, "7z: UnpackInfo without kFolder")
      val nf = c.num().toInt
      require(c.u8() == 0, "7z: external folder defs unsupported")
      val raw = (0 until nf).map { _ =>
        val nc = c.num().toInt
        var totalIn = 0; var totalOut = 0
        val coders = (0 until nc).map { _ =>
          val flags = c.u8()
          val idLen = flags & 0x0f
          var cid = 0L
          (0 until idLen).foreach(_ => cid = (cid << 8) | c.u8())
          val (nIn, nOut) =
            if ((flags & 0x10) != 0) (c.num().toInt, c.num().toInt) else (1, 1)
          val props =
            if ((flags & 0x20) != 0) c.bytes(c.num().toInt) else Array.emptyByteArray
          totalIn += nIn; totalOut += nOut
          Coder(cid, props, nIn, nOut)
        }
        val nBind = totalOut - 1
        val binds = (0 until nBind).map { _ =>
          (c.num().toInt, c.num().toInt)
        }
        val numPacked = totalIn - nBind
        // explicit packed-stream indices only when > 1 (BCJ2 shape);
        // such folders quarantine in decodeFolder, so the order is moot
        if (numPacked > 1) (0 until numPacked).foreach(_ => c.num())
        (coders, totalOut, numPacked, binds)
      }
      t = c.num().toInt
      require(t == K.UnpackSize, "7z: missing kCodersUnpackSize")
      val outSizes = raw.map { case (_, tOut, _, _) => Seq.fill(tOut)(c.num()) }
      var crcs: Seq[Option[Long]] = Seq.fill(nf)(None)
      t = c.num().toInt
      while (t != K.End) {
        if (t == K.Crc) {
          val defined = boolVector(c, nf)
          crcs = defined.toSeq.map(d => if (d) Some(c.u32le()) else None)
        } else c.skip(c.num())
        t = c.num().toInt
      }
      folders = raw.zip(outSizes).zip(crcs).map { case (((cs, _, np, bp), os), crc) =>
        Folder(cs, os, crc, np, bp)
      }
      id = c.num().toInt
    }
    numUnpack = Seq.fill(folders.size)(1)
    subSizes = folders.map(f => Seq(f.outSizes.lastOption.getOrElse(0L)))
    subCrcs = folders.map(f => Seq(f.crc))
    if (id == K.SubStreams) {
      var sizesRead = false
      var t = c.num().toInt
      while (t != K.End) {
        if (t == K.NumUnpack) {
          numUnpack = folders.map(_ => c.num().toInt)
          subSizes = Nil; subCrcs = Nil
        } else if (t == K.Size) {
          sizesRead = true
          subSizes = folders.zip(numUnpack).map { case (f, n) =>
            val explicit = (0 until n - 1).map(_ => c.num())
            val total = f.outSizes.lastOption.getOrElse(0L)
            if (n == 0) Seq.empty else explicit :+ (total - explicit.sum)
          }
        } else if (t == K.Crc) {
          // digests for every substream whose CRC isn't inherited from
          // a single-substream folder
          if (subSizes.isEmpty)
            subSizes = folders.zip(numUnpack).map { case (f, n) =>
              if (n == 1) Seq(f.outSizes.lastOption.getOrElse(0L)) else Seq.empty
            }
          val need = folders.zip(numUnpack).map { case (f, n) =>
            if (n == 1 && f.crc.isDefined) 0 else n
          }
          val defined = boolVector(c, need.sum)
          var di = 0
          subCrcs = folders.zip(numUnpack).map { case (f, n) =>
            if (n == 1 && f.crc.isDefined) Seq(f.crc)
            else (0 until n).map { _ =>
              val v = if (defined(di)) Some(c.u32le()) else None
              di += 1; v
            }
          }
        } else c.skip(c.num())
        t = c.num().toInt
      }
      if (subSizes.isEmpty)
        subSizes = folders.zip(numUnpack).map { case (f, n) =>
          require(n == 1 || sizesRead, "7z: split folder without kSize")
          Seq(f.outSizes.lastOption.getOrElse(0L))
        }
      if (subCrcs.size != folders.size || subCrcs.isEmpty)
        subCrcs = folders.zip(numUnpack).map { case (f, n) =>
          if (n == 1) Seq(f.crc) else Seq.fill(n)(None)
        }
      id = c.num().toInt
    }
    require(id == K.End, s"7z: unexpected id $id in StreamsInfo")
    Streams(packPos, packSizes, folders, subSizes, subCrcs)
  }

  // ------------------------------------------------------ folder decode

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b)
    c.getValue
  }

  /** Decode one folder from the packed area; None on unsupported coder
    * shape or decode failure. Single packed stream only; chains walk
    * the bind pairs backward from the folder's final output (the one
    * no bind pair consumes) — the two-coder filter+LZMA layout real
    * `7z a` emits for executables decodes here, BCJ2's 4-input shape
    * quarantines.
    */
  private def decodeFolder(archive: Array[Byte], packOff: Long, packSize: Long,
      f: Folder): Option[Array[Byte]] = {
    if (f.numPacked != 1) return None
    if (packOff < 0 || packOff + packSize > archive.length) return None
    try {
      val coders = f.coders
      val inBase = coders.scanLeft(0)(_ + _.nIn)
      val outBase = coders.scanLeft(0)(_ + _.nOut)
      val totalOut = outBase.last
      val boundOut = f.bindPairs.map(_._2).toSet
      val finalOut = (0 until totalOut).find(o => !boundOut(o)).getOrElse(
        throw new IllegalArgumentException("7z: folder without a free output"))
      val memo = new Array[Array[Byte]](totalOut)
      def packedSlice(): Array[Byte] =
        java.util.Arrays.copyOfRange(archive, packOff.toInt,
          (packOff + packSize).toInt)
      def outputOf(o: Int): Array[Byte] = {
        if (memo(o) != null) return memo(o)
        val ci = coders.indices.find(i => o >= outBase(i) && o < outBase(i + 1))
          .getOrElse(throw new IllegalArgumentException("7z: bad output index"))
        val coder = coders(ci)
        require(coder.nIn == 1 && coder.nOut == 1,
          "7z: multi-stream coder unsupported") // BCJ2
        val outSize = f.outSizes(o)
        val gin = inBase(ci)
        val fromBind = f.bindPairs.find(_._1 == gin).map(bp => outputOf(bp._2))
        val dec = coder.id match {
          case IdCopy =>
            val in = fromBind.getOrElse {
              require(packSize == outSize, "7z: copy size mismatch")
              packedSlice()
            }
            require(in.length == outSize, "7z: copy size mismatch")
            in
          case IdLzma2 =>
            require(fromBind.isEmpty, "7z: lzma2 over a coder output unsupported")
            XzCodec.lzma2(archive, packOff.toInt,
              (packOff + packSize).toInt, outSize.toInt)
          case IdLzma1 =>
            require(fromBind.isEmpty, "7z: lzma1 over a coder output unsupported")
            // props: 1 byte lc/lp/pb + 4-byte LE dict size (hint only)
            require(coder.props.length >= 1, "7z: lzma1 missing props")
            XzCodec.lzma1(archive, packOff.toInt,
              (packOff + packSize).toInt, coder.props(0) & 0xff, outSize.toInt)
          case IdBcjX86 =>
            // filters transform a sibling coder's full output (or, in a
            // filter-only folder, the packed bytes themselves)
            BranchFilters.bcjX86Decode(fromBind.getOrElse(packedSlice()).clone())
          case IdDelta =>
            require(coder.props.length >= 1, "7z: delta missing distance")
            BranchFilters.deltaDecode(fromBind.getOrElse(packedSlice()).clone(),
              (coder.props(0) & 0xff) + 1)
          case _ => throw new IllegalArgumentException(
            s"7z: coder 0x${coder.id.toHexString} unsupported") // AES/BCJ2/…
        }
        require(dec.length == outSize, "7z: coder output size mismatch")
        memo(o) = dec
        dec
      }
      val out = outputOf(finalOut)
      f.crc match {
        case Some(want) if crc32(out) != want => None
        case _ => Some(out)
      }
    } catch { case _: Exception => None }
  }

  // -------------------------------------------------------------- walk

  private val Magic = Array[Byte]('7', 'z', 0xbc.toByte, 0xaf.toByte, 0x27, 0x1c)

  /** Walk one archive into entries. */
  def entries(bytes: Array[Byte]): Seq[Entry] = {
    def broken = Seq(Entry(null, -1L, crcOk = false, corrupt = true,
      emptyStream = false, isDir = false, null))
    if (bytes == null || bytes.length < 32) return broken
    var i = 0
    while (i < 6) { if (bytes(i) != Magic(i)) return broken; i += 1 }
    val sig = new Cursor(bytes, 8, 32)
    val startCrc = sig.u32le()
    if (crc32(java.util.Arrays.copyOfRange(bytes, 12, 32)) != startCrc) return broken
    val nhOff = { val c = new Cursor(bytes, 12, 32); var v = 0L
      var k = 0; while (k < 8) { v |= (c.u8().toLong << (8 * k)); k += 1 }; v }
    val nhSize = { val c = new Cursor(bytes, 20, 32); var v = 0L
      var k = 0; while (k < 8) { v |= (c.u8().toLong << (8 * k)); k += 1 }; v }
    val nhCrc = { val c = new Cursor(bytes, 28, 32); c.u32le() }
    val hStart = 32 + nhOff
    if (nhSize == 0 || hStart < 32 || hStart + nhSize > bytes.length) return broken
    val headerBytes = java.util.Arrays.copyOfRange(bytes, hStart.toInt,
      (hStart + nhSize).toInt)
    if (crc32(headerBytes) != nhCrc) return broken
    try {
      var hc = new Cursor(headerBytes, 0, headerBytes.length)
      var hid = hc.num().toInt
      if (hid == K.EncodedHeader) {
        // the header itself is a one-folder packed stream
        val si = readStreamsInfo(hc)
        require(si.folders.size == 1, "7z: multi-folder encoded header")
        val dec = decodeFolder(bytes, 32 + si.packPos,
          si.packSizes.headOption.getOrElse(0L), si.folders.head)
          .getOrElse(return broken)
        hc = new Cursor(dec, 0, dec.length)
        hid = hc.num().toInt
      }
      require(hid == K.Header, "7z: not a header")
      var id = hc.num().toInt
      if (id == K.ArchiveProps) {
        var t = hc.num().toInt
        while (t != K.End) { hc.skip(hc.num()); t = hc.num().toInt }
        id = hc.num().toInt
      }
      var streams: Option[Streams] = None
      if (id == K.MainStreams) {
        streams = Some(readStreamsInfo(hc))
        id = hc.num().toInt
      }
      // files info
      var names: Seq[String] = Nil
      var emptyStream: Array[Boolean] = Array.empty
      // over empty-stream ordinals; absent kEmptyFile = all such
      // entries are directories (7-Zip writes the property only when
      // a genuinely empty FILE exists)
      var emptyFile: Array[Boolean] = Array.empty
      // kEmptyFile sizes itself by the kEmptyStream POPCOUNT, but the
      // spec does not mandate property order — a header may emit
      // kEmptyFile first. Record its raw bytes (the per-property size
      // field gives the span) and decode after the loop.
      var emptyFileRaw: Array[Byte] = null
      var nFiles = 0
      if (id == K.FilesInfo) {
        nFiles = hc.num().toInt
        emptyStream = new Array[Boolean](nFiles)
        var t = hc.num().toInt
        while (t != K.End) {
          val size = hc.num()
          val next = hc.p + size.toInt
          t match {
            case K.EmptyStream => emptyStream = bitVector(hc, nFiles)
            case K.EmptyFile =>
              emptyFileRaw = hc.bytes(size.toInt)
            case K.Name =>
              require(hc.u8() == 0, "7z: external names unsupported")
              val sb = new StringBuilder
              val acc = scala.collection.mutable.Buffer.empty[String]
              while (hc.p + 1 < next) {
                val lo = hc.u8(); val hi = hc.u8()
                val ch = (lo | (hi << 8)).toChar
                if (ch == '\u0000') { acc += sb.toString; sb.clear() }
                else sb.append(ch)
              }
              names = acc.toSeq
            case _ => ()
          }
          hc.p = next
          t = hc.num().toInt
        }
        if (emptyFileRaw != null)
          emptyFile = bitVector(new Cursor(emptyFileRaw, 0, emptyFileRaw.length),
            emptyStream.count(identity))
      }
      // assemble: decode folders, split substreams, map to files
      val out = scala.collection.mutable.Buffer.empty[Entry]
      val sub = scala.collection.mutable.Buffer.empty[(Array[Byte], Long, Boolean, Boolean)]
      // (data, size, crcOk, corrupt)
      streams.foreach { si =>
        var packOff = 32 + si.packPos
        si.folders.zipWithIndex.foreach { case (f, fi) =>
          val packSize = si.packSizes.lift(fi).getOrElse(0L)
          val sizes = si.subSizes.lift(fi).getOrElse(Seq.empty)
          val crcs = si.subCrcs.lift(fi).getOrElse(Seq.empty)
          decodeFolder(bytes, packOff, packSize, f) match {
            case Some(payload) =>
              var off = 0L
              sizes.zipWithIndex.foreach { case (sz, k) =>
                if (off + sz > payload.length)
                  sub += ((null, sz, false, true))
                else {
                  val d = java.util.Arrays.copyOfRange(payload, off.toInt,
                    (off + sz).toInt)
                  val ok = crcs.lift(k).flatten.forall(_ == crc32(d))
                  sub += ((if (ok) d else null, sz, ok, !ok))
                }
                off += sz
              }
            case None =>
              sizes.foreach(sz => sub += ((null, sz, false, true)))
          }
          packOff += packSize
        }
      }
      var si = 0
      var ei = 0 // empty-stream ordinal (the kEmptyFile index space)
      val n = if (nFiles > 0) nFiles else sub.size
      (0 until n).foreach { k =>
        val name = names.lift(k).orNull
        if (k < emptyStream.length && emptyStream(k)) {
          val isFile = ei < emptyFile.length && emptyFile(ei); ei += 1
          out += Entry(name, 0L, crcOk = true, corrupt = false,
            emptyStream = true, isDir = !isFile, Array.emptyByteArray)
        } else if (si < sub.size) {
          val (d, sz, ok, bad) = sub(si); si += 1
          out += Entry(name, sz, ok, bad, emptyStream = false,
            isDir = false, d)
        } else out += Entry(name, -1L, crcOk = false, corrupt = true,
          emptyStream = false, isDir = false, null)
      }
      out.toSeq
    } catch { case _: Exception => broken }
  }

  // ---------------------------------------------------------- fixtures

  /** REAL_UINT64 writer (inverse of [[Cursor.num]]): i tail bytes give
    * capacity 2^(7+7i); first byte = i leading ones, a zero flag bit,
    * then the high (7-i) value bits.
    */
  private def wnum(v: Long, out: scala.collection.mutable.ArrayBuffer[Byte]): Unit = {
    require(v >= 0, "wnum: negative")
    var i = 0
    while (i < 8 && v >= (1L << (7 + 7 * i))) i += 1
    if (i == 8) {
      out += 0xff.toByte
      (0 until 8).foreach(k => out += ((v >> (8 * k)) & 0xff).toByte)
    } else {
      val high = (v >> (8 * i)).toInt
      out += (((0xff << (8 - i)) & 0xff) | high).toByte
      (0 until i).foreach(k => out += ((v >> (8 * k)) & 0xff).toByte)
    }
  }

  private def wu32(v: Long, out: scala.collection.mutable.ArrayBuffer[Byte]): Unit =
    (0 until 4).foreach(k => out += ((v >> (8 * k)) & 0xff).toByte)

  /** Real-encoder fixture: archive written by commons-compress
    * `SevenZOutputFile` (one folder per entry, plain header) with the
    * given content method — `"copy"`, `"lzma"` (classic 0x030101) or
    * `"lzma2"`. An INDEPENDENT encoder, so round-trip equality
    * witnesses the from-spec decoder against a foreign implementation
    * rather than against itself.
    */
  def fixture(recs: Seq[(String, Array[Byte])], method: String): Array[Byte] = {
    import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZMethod, SevenZMethodConfiguration, SevenZOutputFile}
    val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel()
    val out = new SevenZOutputFile(ch)
    // preset 1 (256K dict, hash-chain match finder): the default preset
    // 6 allocates an 8M BT4 dictionary PER ARCHIVE — measured 31 s of
    // the sf0.1 sweep spent encoding fixtures; the decoder and the
    // oracle are preset-independent
    val cfg = method match {
      case "copy" => new SevenZMethodConfiguration(SevenZMethod.COPY)
      case "lzma" => new SevenZMethodConfiguration(SevenZMethod.LZMA,
        new org.tukaani.xz.LZMA2Options(1))
      case _ => new SevenZMethodConfiguration(SevenZMethod.LZMA2,
        new org.tukaani.xz.LZMA2Options(1))
    }
    out.setContentMethods(java.util.Collections.singletonList(cfg))
    recs.foreach { case (name, bytes) =>
      val e = new SevenZArchiveEntry()
      e.setName(name)
      e.setDirectory(false)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }

  /** Real-encoder FILTER-CHAIN fixture: commons-compress writes each
    * entry through `filter → LZMA2` two-coder folders (`"bcj"` = the
    * xz-java x86 BCJ encoder, `"delta"` = the delta filter with the
    * given distance) — the default `7z a` layout for executables, and
    * a foreign encoder for the bind-pair walk + filter decode.
    */
  def fixtureFiltered(recs: Seq[(String, Array[Byte])],
      filter: String, deltaDist: Int = 4): Array[Byte] = {
    import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZMethod, SevenZMethodConfiguration, SevenZOutputFile}
    val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel()
    val out = new SevenZOutputFile(ch)
    val head = filter match {
      case "bcj" => new SevenZMethodConfiguration(SevenZMethod.BCJ_X86_FILTER)
      case "delta" => new SevenZMethodConfiguration(SevenZMethod.DELTA_FILTER,
        Integer.valueOf(deltaDist))
      case other => throw new IllegalArgumentException(s"filter $other")
    }
    val cfg = java.util.Arrays.asList(head,
      new SevenZMethodConfiguration(SevenZMethod.LZMA2,
        new org.tukaani.xz.LZMA2Options(1)))
    out.setContentMethods(cfg)
    recs.foreach { case (name, bytes) =>
      val e = new SevenZArchiveEntry()
      e.setName(name)
      e.setDirectory(false)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }

  /** Copy-method fixture with one mid-payload bit of the FIRST entry
    * flipped — the deterministic substream-CRC quarantine witness
    * (copy packing ⇒ the flipped byte is that entry's payload byte,
    * so exactly entry 0 goes corrupt, name kept).
    */
  def fixtureCorrupt(recs: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(recs.nonEmpty && recs.head._2.nonEmpty, "corrupt fixture needs a payload")
    val a = fixture(recs, "copy")
    val at = 32 + recs.head._2.length / 2
    a(at) = (a(at) ^ 0x40).toByte
    a
  }

  /** Hand-serialized SOLID fixture: ONE copy-coded folder holding all
    * payloads back-to-back, split by `kSubStreamsInfo` (NumUnpackStream
    * + explicit sizes + per-substream CRCs), with the header itself
    * packed as a copy-coded `kEncodedHeader` folder — the two layout
    * legs (solid folders, encoded headers) that `7z a` emits by
    * default and commons-compress never writes.
    */
  def fixtureSolid(recs: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(recs.nonEmpty && recs.forall(_._2.nonEmpty), "solid fixture: non-empty payloads")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    val data = recs.flatMap(_._2).toArray
    val n = recs.size

    // inner header
    val h = scala.collection.mutable.ArrayBuffer.empty[Byte]
    h += K.Header.toByte
    h += K.MainStreams.toByte
    h += K.PackInfo.toByte; wnum(0L, h); wnum(1L, h)
    h += K.Size.toByte; wnum(data.length.toLong, h); h += K.End.toByte
    h += K.UnpackInfo.toByte
    h += K.Folder.toByte; wnum(1L, h); h += 0.toByte
    h += 0x01.toByte; h += 0x00.toByte // one coder, 1-byte id, Copy
    h += K.UnpackSize.toByte; wnum(data.length.toLong, h)
    h += K.Crc.toByte; h += 1.toByte; wu32(crc32(data), h)
    h += K.End.toByte
    h += K.SubStreams.toByte
    h += K.NumUnpack.toByte; wnum(n.toLong, h)
    h += K.Size.toByte; recs.init.foreach(r => wnum(r._2.length.toLong, h))
    h += K.Crc.toByte; h += 1.toByte; recs.foreach(r => wu32(crc32(r._2), h))
    h += K.End.toByte
    h += K.End.toByte // end of MainStreamsInfo
    h += K.FilesInfo.toByte; wnum(n.toLong, h)
    val nameBytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    nameBytes += 0.toByte // not external
    recs.foreach { case (name, _) =>
      (name + "\u0000").foreach { ch =>
        nameBytes += (ch & 0xff).toByte; nameBytes += ((ch >> 8) & 0xff).toByte
      }
    }
    h += K.Name.toByte; wnum(nameBytes.length.toLong, h); h ++= nameBytes
    h += K.End.toByte // end of FilesInfo
    h += K.End.toByte // end of Header
    val header = h.toArray

    // encoded-header wrapper: the header is pack stream #2, copy-coded
    val e = scala.collection.mutable.ArrayBuffer.empty[Byte]
    e += K.EncodedHeader.toByte
    e += K.PackInfo.toByte; wnum(data.length.toLong, e); wnum(1L, e)
    e += K.Size.toByte; wnum(header.length.toLong, e); e += K.End.toByte
    e += K.UnpackInfo.toByte
    e += K.Folder.toByte; wnum(1L, e); e += 0.toByte
    e += 0x01.toByte; e += 0x00.toByte
    e += K.UnpackSize.toByte; wnum(header.length.toLong, e)
    e += K.Crc.toByte; e += 1.toByte; wu32(crc32(header), e)
    e += K.End.toByte
    e += K.End.toByte
    val blob = e.toArray

    // signature header
    buf ++= Magic
    buf += 0.toByte; buf += 4.toByte // version 0.4
    val nhOff = data.length.toLong + header.length
    val start = scala.collection.mutable.ArrayBuffer.empty[Byte]
    (0 until 8).foreach(k => start += ((nhOff >> (8 * k)) & 0xff).toByte)
    (0 until 8).foreach(k => start += ((blob.length.toLong >> (8 * k)) & 0xff).toByte)
    wu32(crc32(blob), start)
    wu32(crc32(start.toArray), buf)
    buf ++= start
    buf ++= data
    buf ++= header
    buf ++= blob
    buf.toArray
  }

  // ------------------------------------------------------------- Spark

  final case class EntryRow(
      doc_id: Long,
      name: String,
      size: Long,
      crc_ok: Boolean,
      corrupt: Boolean,
      is_dir: Boolean,
      body_text: String)

  /** Partition-parallel entry walk over (doc_id, payload). */
  def parseEntries(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[EntryRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        entries(bytes).map(e => EntryRow(id, e.name, e.size, e.crcOk, e.corrupt,
          e.isDir,
          if (e.data == null) null else graft.functions.Text.decodeCharset(e.data)))
      })
  }
}
