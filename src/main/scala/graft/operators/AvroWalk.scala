package graft.operators

/** Avro Object Container File walk — from-spec (the Avro 1.x spec's
  * file container + binary encoding): the data-lake interchange format
  * Spark itself has NO built-in SQL reader for (the spark-avro
  * connector is a separate artifact, absent here — which is exactly
  * when an engine needs its own front door). Implements the container
  * grammar — "Obj\x01" magic, the file-metadata map (schema JSON,
  * codec), the 16-byte sync marker, count+size-prefixed blocks with
  * null / deflate / snappy(+CRC32) / zstandard codecs (the latter two
  * decoded by the in-repo [[SnappyCodec]]/[[ZstdCodec]]) — and the
  * binary value encoding for FLAT record schemas: zigzag-varint
  * int/long, length-prefixed utf8/bytes, little-endian float/double,
  * boolean, and ["null", T] optional unions. Nested/recursive schemas
  * are honestly out of subset (the walk reports them and quarantines
  * nothing silently).
  *
  * Splittability contract: the sync marker is Avro's OWN resync
  * mechanism — a corrupt block quarantines one span and the walk
  * resynchronizes at the next marker occurrence, byte-for-byte the
  * [[Warc]]/[[Tar]] quarantine story.
  *
  * Correctness anchor: the reference Avro library ships on the Spark
  * classpath (avro-1.12.1), so the spec round-trips this walk against
  * real DataFileWriter output in all four codecs.
  */
object AvroWalk {

  // ------------------------------------------------------- tiny JSON

  /** Minimal JSON parser for the canonical schema strings the Avro
    * library embeds (objects, arrays, strings with escapes, numbers,
    * booleans, null) — enough to read a record schema's field list.
    */
  private[operators] object Json {
    sealed trait V
    final case class S(s: String) extends V
    final case class N(d: Double) extends V
    final case class B(b: Boolean) extends V
    case object Null extends V
    final case class A(items: List[V]) extends V
    final case class O(fields: Map[String, V]) extends V

    def parse(s: String): V = {
      val p = new P(s)
      val v = p.value()
      p.ws()
      require(p.eof, "trailing JSON")
      v
    }
    private final class P(s: String) {
      var i = 0
      def eof: Boolean = i >= s.length
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      def expect(c: Char): Unit = {
        ws(); require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i"); i += 1
      }
      def value(): V = {
        ws()
        require(i < s.length, "eof in JSON")
        s.charAt(i) match {
          case '{' =>
            i += 1; ws()
            var m = Map.empty[String, V]
            if (s.charAt(i) == '}') { i += 1; return O(m) }
            var done = false
            while (!done) {
              ws()
              val k = str()
              expect(':')
              m += (k -> value())
              ws()
              if (s.charAt(i) == ',') i += 1 else { expect('}'); done = true }
            }
            O(m)
          case '[' =>
            i += 1; ws()
            var items = List.empty[V]
            if (s.charAt(i) == ']') { i += 1; return A(items) }
            var done = false
            while (!done) {
              items = value() :: items
              ws()
              if (s.charAt(i) == ',') i += 1 else { expect(']'); done = true }
            }
            A(items.reverse)
          case '"' => S(str())
          case 't' => require(s.startsWith("true", i)); i += 4; B(true)
          case 'f' => require(s.startsWith("false", i)); i += 5; B(false)
          case 'n' => require(s.startsWith("null", i)); i += 4; Null
          case _ =>
            val start = i
            while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
            N(s.substring(start, i).toDouble)
        }
      }
      def str(): String = {
        ws(); require(s.charAt(i) == '"', s"expected string at $i"); i += 1
        val sb = new StringBuilder
        while (s.charAt(i) != '"') {
          val c = s.charAt(i)
          if (c == '\\') {
            i += 1
            s.charAt(i) match {
              case 'n' => sb.append('\n')
              case 't' => sb.append('\t')
              case 'r' => sb.append('\r')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
                i += 4
              case other => sb.append(other)
            }
          } else sb.append(c)
          i += 1
        }
        i += 1
        sb.toString
      }
    }
  }

  // ------------------------------------------------------ schema model

  /** A flat-record field. `nullIndex` is the union position of "null"
    * (-1 when the field is not nullable) — the branch index the binary
    * decoder must compare against.
    */
  final case class Field(name: String, tpe: String, nullIndex: Int) {
    def nullable: Boolean = nullIndex >= 0
  }

  private val Primitives =
    Set("long", "int", "string", "double", "float", "boolean", "bytes")

  /** Parse a record schema's fields; None if out of the flat subset. */
  private[operators] def recordFields(schemaJson: String): Option[Seq[Field]] = {
    try {
      val Json.O(root) = Json.parse(schemaJson): @unchecked
      if (!root.get("type").contains(Json.S("record"))) return None
      val Json.A(fields) = root("fields"): @unchecked
      val out = fields.map {
        case Json.O(f) =>
          val name = f("name") match { case Json.S(n) => n; case _ => return None }
          f("type") match {
            case Json.S(t) if Primitives(t) => Field(name, t, nullIndex = -1)
            case Json.A(List(Json.S("null"), Json.S(t))) if Primitives(t) =>
              Field(name, t, nullIndex = 0)
            case Json.A(List(Json.S(t), Json.S("null"))) if Primitives(t) =>
              Field(name, t, nullIndex = 1)
            case _ => return None // nested/complex: out of subset
          }
        case _ => return None
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  // --------------------------------------------------- binary decoding

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def varlong(): Long = {
      var v = 0L
      var shift = 0
      var done = false
      while (!done) {
        require(pos < end && shift <= 63, "corrupt varint")
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        if ((x & 0x80) == 0) done = true
      }
      (v >>> 1) ^ -(v & 1) // zigzag
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= end, "corrupt length")
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    def le(n: Int): Long = {
      var v = 0L; var k = 0
      require(pos + n <= end, "truncated fixed")
      while (k < n) { v |= (b(pos + k) & 0xffL) << (8 * k); k += 1 }
      pos += n; v
    }
  }

  /** Decode one record's fields to display strings (the walk's typed
    * carrier is the string form; null → null).
    */
  private def readRecord(r: Reader, fields: Seq[Field]): Seq[String] =
    fields.map { f =>
      val present = if (f.nullable) {
        val idx = r.varlong()
        require(idx == 0 || idx == 1, "bad union index")
        idx != f.nullIndex
      } else true
      if (!present) null
      else f.tpe match {
        case "long" | "int" => r.varlong().toString
        case "boolean" => (r.bytes(1)(0) != 0).toString
        case "double" => java.lang.Double.longBitsToDouble(r.le(8)).toString
        case "float" => java.lang.Float.intBitsToFloat(r.le(4).toInt).toString
        case "bytes" =>
          val n = r.varlong().toInt
          java.util.Base64.getEncoder.encodeToString(r.bytes(n))
        case _ => // string
          val n = r.varlong().toInt
          new String(r.bytes(n), "UTF-8")
      }
    }

  // ------------------------------------------------------ container walk

  final case class Rec(
      blockOffset: Long,
      values: Seq[String], // field values in schema order; null per field allowed
      corrupt: Boolean)

  final case class FileInfo(
      schemaJson: String,
      codec: String,
      fields: Option[Seq[Field]],
      records: Seq[Rec])

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** Walk one OCF payload. Returns None only when the MAGIC/header is
    * absent (not an Avro file); block-level corruption quarantines a
    * span and resynchronizes at the next sync-marker occurrence.
    */
  def walk(b: Array[Byte]): Option[FileInfo] = {
    try {
      if (b == null || b.length < 4 + 16) return None
      var i = 0
      while (i < 4) { if (b(i) != Magic(i)) return None; i += 1 }
      val r = new Reader(b, 4, b.length)
      // file metadata map: blocks of (count, then count × (key, value))
      var meta = Map.empty[String, Array[Byte]]
      var n = r.varlong()
      while (n != 0) {
        val cnt = math.abs(n) // negative count = block with byte size prefix
        if (n < 0) r.varlong() // skip the size
        var k = 0L
        while (k < cnt) {
          val key = new String(r.bytes(r.varlong().toInt), "UTF-8")
          val v = r.bytes(r.varlong().toInt)
          meta += (key -> v)
          k += 1
        }
        n = r.varlong()
      }
      val schema = new String(meta.getOrElse("avro.schema", return None), "UTF-8")
      val codec = meta.get("avro.codec").map(new String(_, "UTF-8")).getOrElse("null")
      val sync = r.bytes(16)
      val fields = recordFields(schema)
      val out = scala.collection.mutable.Buffer.empty[Rec]
      var pos = r.pos
      def syncAt(p: Int): Boolean =
        p + 16 <= b.length && java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(b, p, p + 16), sync)
      while (pos < b.length) {
        val blockStart = pos
        val ok =
          try {
            val br = new Reader(b, pos, b.length)
            val count = br.varlong()
            val size = br.varlong()
            require(count > 0 && size >= 0 && br.pos + size + 16 <= b.length,
              "block overruns file")
            val raw = br.bytes(size.toInt)
            require(syncAt(br.pos), "sync marker mismatch")
            val data = codec match {
              case "null" => raw
              case "deflate" =>
                val inf = new java.util.zip.Inflater(true)
                inf.setInput(raw)
                val bos = new java.io.ByteArrayOutputStream()
                val buf = new Array[Byte](1 << 16)
                while (!inf.finished()) {
                  val k = inf.inflate(buf)
                  // any zero-progress state that is not completion —
                  // truncated input, a preset-dictionary demand, or any
                  // other stall — fails into the quarantine path instead
                  // of spinning an executor forever on a hostile block
                  require(k > 0 || inf.finished(), "truncated or stalled deflate")
                  bos.write(buf, 0, k)
                }
                inf.end()
                bos.toByteArray
              case "snappy" =>
                // avro frames snappy blocks with a BIG-ENDIAN CRC32 tail
                require(raw.length >= 4, "snappy block too small")
                val body = SnappyCodec.decodeRaw(raw, 0, raw.length - 4)
                val crc = new java.util.zip.CRC32()
                crc.update(body)
                val want = ((raw(raw.length - 4) & 0xffL) << 24) |
                  ((raw(raw.length - 3) & 0xffL) << 16) |
                  ((raw(raw.length - 2) & 0xffL) << 8) |
                  (raw(raw.length - 1) & 0xffL)
                require(crc.getValue == want, "avro snappy CRC mismatch")
                body
              case "zstandard" =>
                ZstdCodec.decode(raw).getOrElse(throw new IllegalArgumentException("bad zstd block"))
              case other => throw new IllegalArgumentException(s"codec $other out of subset")
            }
            fields.foreach { fs =>
              val dr = new Reader(data, 0, data.length)
              var c = 0L
              while (c < count) {
                out += Rec(blockStart.toLong, readRecord(dr, fs), corrupt = false)
                c += 1
              }
              require(dr.pos == data.length, "trailing bytes in block")
            }
            pos = br.pos + 16
            true
          } catch { case _: Exception => false }
        if (!ok) {
          // resync at the next sync-marker occurrence (Avro's own
          // splittability mechanism); records of the bad span are ONE
          // quarantined row
          out += Rec(blockStart.toLong, null, corrupt = true)
          var p = blockStart + 1
          var next = b.length
          while (next == b.length && p + 16 <= b.length) {
            if (syncAt(p)) next = p + 16
            p += 1
          }
          pos = next
        }
      }
      Some(FileInfo(schema, codec, fields, out.toSeq))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------- Spark

  final case class AvroRec(
      doc_id: Long,
      codec: String,
      block_offset: Long,
      corrupt: Boolean,
      values: Seq[String])

  /** Partition-parallel OCF walk over (doc_id, payload). */
  def parseRecords(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[AvroRec] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        walk(bytes) match {
          case None => Iterator.single(AvroRec(id, "(not-avro)", 0L, corrupt = true, null))
          case Some(info) =>
            info.records.iterator.map(rec =>
              AvroRec(id, info.codec, rec.blockOffset, rec.corrupt, rec.values))
        }
      })
  }
}
