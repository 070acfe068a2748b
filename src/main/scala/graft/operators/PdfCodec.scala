package graft.operators

import scala.collection.mutable

/** PDF document walk + text extraction (ISO 32000-1 subset, from spec)
  * — the "PDF → text" ingestion step of a pretraining corpus, pure JVM.
  *
  * Decode side: `%PDF-x.y` header; `startxref` located from the tail;
  * CLASSIC cross-reference tables (20-byte entries, multiple
  * subsections, `f`/`n` kinds) with trailer dicts chained through
  * `/Prev` (incremental updates — later sections win); full COS object
  * grammar (dicts, arrays, names with `#xx` escapes, literal strings
  * with nesting/escapes/octal, hex strings, numbers, booleans, null,
  * indirect references, comments); streams with direct OR indirect
  * `/Length` and raw or `/FlateDecode` (zlib `Inflater`) filters; the
  * page tree walked through nested `/Pages` nodes; per-page content
  * (single ref or array, concatenated in order) tokenized for the text
  * operators `Tj`, `'`, `"`, `TJ` (strings shown, kerning ignored) with
  * `Td`/`TD`/`T*`/`ET` line semantics.
  *
  * Quarantine contract: a broken header/xref/trailer/catalog fails the
  * DOCUMENT (`ok = false`); a broken page content stream (truncated
  * flate, bad length, unsupported filter) fails THAT PAGE
  * (`page.ok = false`, empty text) and the rest of the document keeps
  * decoding — the [[ZipWalk]]/[[Warc]] shape one container level up.
  *
  * PDF 1.5 compression is IN subset: xref STREAMS (`/W`/`/Index`
  * typed rows, FlateDecode + PNG predictors 0–4 via [[pngUnpredict]]),
  * object streams (`/Type /ObjStm` header-pair layout, type-2 xref
  * entries), and hybrid files (`/XRefStm` in a classic trailer).
  * Still out, honestly: encryption, CMap/ToUnicode (text bytes decode
  * as Latin-1 — exact for the standard-encoding Type1 fixtures and
  * the right 80% answer for legacy simple-font corpora), filters
  * other than Flate fail the page.
  *
  * Scale shape: one document per row, decode inside `mapPartitions` —
  * bytes-linear, scan-local, zero shuffle before the caller's
  * aggregate.
  */
object PdfCodec {

  // ------------------------------------------------------------ COS model

  sealed trait Obj
  final case class PNum(v: Double) extends Obj { def i: Int = v.toInt }
  final case class PName(v: String) extends Obj
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PBool(v: Boolean) extends Obj
  case object PNull extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  // ------------------------------------------------------------- results

  final case class Page(ok: Boolean, text: String)
  final case class Doc(
      ok: Boolean,
      version: String, // "" when the header is broken
      nObjects: Int,
      title: String, // "" when absent
      pages: Seq[Page])

  private def fail(version: String = ""): Doc =
    Doc(ok = false, version, 0, "", Seq.empty)

  // -------------------------------------------------------------- lexer

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent COS reader over a byte window. */
  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def eof: Boolean = pos >= b.length
    def cur: Int = if (eof) -1 else b(pos) & 0xff

    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        if (isWs(cur)) pos += 1
        else if (cur == '%') { while (!eof && cur != '\n' && cur != '\r') pos += 1 }
        else go = false
      }
    }

    /** Next regular-character token (keyword or number text). */
    def token(): String = {
      skipWs()
      val s = pos
      while (!eof && !isWs(cur) && !isDelim(cur)) pos += 1
      new String(b, s, pos - s, "ISO-8859-1")
    }

    def peekToken(): String = { val p = pos; val t = token(); pos = p; t }

    def expect(kw: String): Boolean = token() == kw

    def name(): PName = { // cur is '/'
      pos += 1
      val sb = new StringBuilder
      while (!eof && !isWs(cur) && !isDelim(cur)) {
        if (cur == '#' && pos + 2 < b.length) {
          sb.append(Integer.parseInt(
            new String(b, pos + 1, 2, "ISO-8859-1"), 16).toChar)
          pos += 3
        } else { sb.append(cur.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    def literalString(): PStr = { // cur is '('
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (!eof && depth > 0) {
        val c = cur
        pos += 1
        c match {
          case '\\' =>
            val e = cur; pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (cur == '\n') pos += 1 // line continuation
              case '\n' => ()
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && cur >= '0' && cur <= '7') {
                  v = v * 8 + (cur - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    def hexString(): PStr = { // cur is '<' (single)
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (!eof && cur != '>') {
        val c = cur
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
        pos += 1
      }
      if (hi >= 0) out.write(hi * 16) // odd count: trailing 0 per spec
      pos += 1
      PStr(out.toByteArray)
    }

    /** One COS value. Indirect refs are recognized by `int int R`
      * lookahead; `int int obj` is NOT consumed here.
      */
    def value(): Obj = {
      skipWs()
      if (eof) return PNull
      cur match {
        case '<' if pos + 1 < b.length && (b(pos + 1) & 0xff) == '<' =>
          pos += 2
          val m = mutable.LinkedHashMap.empty[String, Obj]
          var go = true
          while (go) {
            skipWs()
            if (eof) go = false
            else if (cur == '>' ) { pos += 2; go = false }
            else {
              val k = name().v
              m(k) = value()
            }
          }
          PDict(m.toMap)
        case '<' => hexString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          var go = true
          while (go) {
            skipWs()
            if (eof) go = false
            else if (cur == ']') { pos += 1; go = false }
            else items += value()
          }
          PArr(items.result())
        case '/' => name()
        case '(' => literalString()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val t = token()
          // `int int R` → reference (both must be non-negative integers)
          if (t.forall(_.isDigit)) {
            val save = pos
            val t2 = token()
            if (t2.nonEmpty && t2.forall(_.isDigit)) {
              if (token() == "R") return PRef(t.toInt, t2.toInt)
              pos = save
            } else pos = save
          }
          PNum(t.toDouble)
        case _ =>
          token() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "" => if (!eof) pos += 1; PNull // stray delimiter: consume
            case _ => PNull // `null` and anything stray
          }
      }
    }
  }

  // ---------------------------------------------------------- xref parse

  /** Cross-reference entry: a direct byte offset, or a slot inside an
    * object stream (PDF 1.5 type-2 entries).
    */
  private[operators] sealed trait XEntry
  private[operators] final case class XOff(off: Int) extends XEntry
  private[operators] final case class XInStm(stm: Int, idx: Int) extends XEntry

  /** In-use entries from the xref chain at `startOff` — CLASSIC tables
    * and PDF 1.5 xref STREAMS both, chained through `/Prev` (and the
    * hybrid-file `/XRefStm` pointer), earliest-seen (= latest update)
    * wins — plus the merged trailer.
    */
  private def readXrefChain(
      b: Array[Byte], startOff: Int): Option[(Map[Int, XEntry], Map[String, Obj])] = {
    val offsets = mutable.Map.empty[Int, XEntry]
    var trailer = Map.empty[String, Obj]
    var off = startOff
    var hops = 0

    def put(num: Int, e: XEntry): Unit =
      if (!offsets.contains(num)) offsets(num) = e
    def mergeTrailer(m: Map[String, Obj]): Unit =
      for ((k, v) <- m) if (!trailer.contains(k)) trailer += (k -> v)

    /** One xref STREAM section at `pos`; returns its dict. */
    def readXrefStream(pos: Int): Option[Map[String, Obj]] = {
      val lx = new Lexer(b, pos)
      val t1 = lx.token(); lx.token()
      if (!(lx.token() == "obj" && t1.nonEmpty && t1.forall(_.isDigit)))
        return None
      lx.value() match {
        case d: PDict =>
          lx.skipWs()
          if (!lx.expect("stream")) return None
          if (lx.cur == '\r') lx.pos += 1
          if (lx.cur == '\n') lx.pos += 1
          val len = d.m.get("Length") match {
            case Some(PNum(n)) => n.toInt
            case _ => return None // indirect Length in the xref stream: unsupported
          }
          if (lx.pos + len > b.length) return None
          val raw = java.util.Arrays.copyOfRange(lx.b, lx.pos, lx.pos + len)
          val flate = d.m.get("Filter") match {
            case Some(PName("FlateDecode")) => inflateZlib(raw)
            case None => Some(raw)
            case _ => None
          }
          val data = flate.flatMap { f =>
            d.m.get("DecodeParms").orElse(d.m.get("DP")) match {
              case Some(PDict(dp)) =>
                val pred = dp.get("Predictor") match {
                  case Some(PNum(p)) => p.toInt; case _ => 1
                }
                val cols = dp.get("Columns") match {
                  case Some(PNum(c)) => c.toInt; case _ => 1
                }
                if (pred >= 10) pngUnpredict(f, cols) else Some(f)
              case _ => Some(f)
            }
          }.getOrElse(return None)
          val w = d.m.get("W") match {
            case Some(PArr(ws)) => ws.map { case PNum(x) => x.toInt; case _ => return None }
            case _ => return None
          }
          if (w.length < 3) return None
          val size = d.m.get("Size") match {
            case Some(PNum(s)) => s.toInt; case _ => return None
          }
          val index: Seq[(Int, Int)] = d.m.get("Index") match {
            case Some(PArr(ix)) =>
              ix.map { case PNum(x) => x.toInt; case _ => return None }
                .grouped(2).collect { case Seq(s, n) => (s, n) }.toSeq
            case _ => Seq((0, size))
          }
          val rowLen = w.sum
          var p = 0
          def field(wi: Int): Long = {
            var v = 0L
            var k = 0
            while (k < wi) { v = (v << 8) | (data(p) & 0xffL); p += 1; k += 1 }
            v
          }
          for ((start, count) <- index; i <- 0 until count) {
            if (p + rowLen > data.length) return None
            val t = if (w(0) == 0) 1L else field(w(0))
            val f2 = field(w(1))
            val f3 = field(w(2))
            t match {
              case 1L => put(start + i, XOff(f2.toInt))
              case 2L => put(start + i, XInStm(f2.toInt, f3.toInt))
              case _ => () // type 0 free (or unknown): skip
            }
          }
          Some(d.m)
        case _ => None
      }
    }

    while (off >= 0 && hops < 64) {
      hops += 1
      if (off >= b.length) return None
      val lx = new Lexer(b, off)
      if (lx.peekToken() == "xref") {
        lx.token()
        var go = true
        while (go) {
          val save = lx.pos
          val t = lx.token()
          if (t == "trailer") go = false
          else if (t.nonEmpty && t.forall(_.isDigit)) {
            val first = t.toInt
            val count = lx.token().toInt
            lx.skipWs()
            var i = 0
            while (i < count) {
              // 20-byte entries: 10-digit offset, 5-digit gen, kind
              val eo = new String(lx.b, lx.pos, 10, "ISO-8859-1").toInt
              val kind = (lx.b(lx.pos + 17) & 0xff).toChar
              if (kind == 'n') put(first + i, XOff(eo))
              else if (kind == 'f') put(first + i, XOff(-1)) // free
              lx.pos += (if (lx.pos + 20 <= lx.b.length &&
                isWs(lx.b(lx.pos + 19) & 0xff)) 20 else 19)
              lx.skipWs()
              i += 1
            }
          } else { lx.pos = save; return None }
        }
        lx.value() match {
          case PDict(m) =>
            // hybrid files: the classic section's stream twin fills
            // type-2 entries the table can't express
            m.get("XRefStm") match {
              case Some(PNum(x)) => readXrefStream(x.toInt)
              case _ => None
            }
            mergeTrailer(m)
            m.get("Prev") match {
              case Some(PNum(p)) => off = p.toInt
              case _ => off = -1
            }
          case _ => return None
        }
      } else {
        readXrefStream(off) match {
          case Some(m) =>
            mergeTrailer(m)
            m.get("Prev") match {
              case Some(PNum(p)) => off = p.toInt
              case _ => off = -1
            }
          case None => return None
        }
      }
    }
    Some((offsets.toMap.filter {
      case (_, XOff(o)) => o >= 0
      case _ => true
    }, trailer))
  }

  /** PNG row unfilter (bpp = 1, the xref-stream shape): each row is a
    * filter-type byte + `columns` data bytes; None/Sub/Up/Average/
    * Paeth per the PNG spec.
    */
  private[operators] def pngUnpredict(
      data: Array[Byte], columns: Int): Option[Array[Byte]] = {
    if (columns <= 0 || data.length % (columns + 1) != 0) return None
    val rows = data.length / (columns + 1)
    val out = new Array[Byte](rows * columns)
    val prior = new Array[Int](columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * (columns + 1)) & 0xff
      var i = 0
      while (i < columns) {
        val x = data(r * (columns + 1) + 1 + i) & 0xff
        val a = if (i > 0) out(r * columns + i - 1) & 0xff else 0
        val bUp = prior(i)
        val c = if (i > 0 && r > 0) out((r - 1) * columns + i - 1) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + bUp
          case 3 => x + ((a + bUp) >> 1)
          case 4 =>
            val pp = a + bUp - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - bUp)
            val pc = math.abs(pp - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bUp else c)
          case _ => return None
        }
        out(r * columns + i) = (v & 0xff).toByte
        i += 1
      }
      i = 0
      while (i < columns) { prior(i) = out(r * columns + i) & 0xff; i += 1 }
      r += 1
    }
    Some(out)
  }

  // --------------------------------------------------------- doc decode

  private final class Resolver(b: Array[Byte], offsets: Map[Int, XEntry]) {
    private val cache = mutable.Map.empty[Int, Obj]
    private val stmCache = mutable.Map.empty[Int, Array[Obj]]

    def apply(o: Obj): Obj = o match {
      case PRef(n, _) => fetch(n)
      case other => other
    }

    def fetch(num: Int): Obj = cache.getOrElseUpdate(num, {
      offsets.get(num) match {
        case Some(XOff(off)) if off >= 0 && off < b.length =>
          fetchAt(num, off)
        case Some(XInStm(stm, idx)) =>
          val objs = stmCache.getOrElseUpdate(stm, objStmObjects(stm))
          if (idx >= 0 && idx < objs.length) objs(idx) else PNull
        case _ => PNull
      }
    })

    private def fetchAt(num: Int, off: Int): Obj = {
      val lx = new Lexer(b, off)
      val t1 = lx.token(); lx.token(); val t3 = lx.token()
      if (!(t3 == "obj" && t1.forall(_.isDigit) && t1.toInt == num)) PNull
      else {
        val v = lx.value()
        lx.skipWs()
        v match {
          case d: PDict if lx.peekToken() == "stream" =>
            lx.expect("stream")
            // EOL after `stream`: CRLF or LF
            if (lx.cur == '\r') lx.pos += 1
            if (lx.cur == '\n') lx.pos += 1
            val len = apply(d.m.getOrElse("Length", PNull)) match {
              case PNum(n0) => n0.toInt
              case _ => -1
            }
            if (len < 0 || lx.pos + len > b.length) PNull
            else PStream(d, java.util.Arrays.copyOfRange(
              lx.b, lx.pos, lx.pos + len))
          case other => other
        }
      }
    }

    /** All objects of an object stream (/Type /ObjStm — PDF 1.5 §7.5.7):
      * decoded data begins with N (objnum, offset) integer pairs, the
      * i-th object at /First + offset_i. Object streams themselves are
      * always direct (the spec forbids nesting).
      */
    private def objStmObjects(stm: Int): Array[Obj] =
      fetch(stm) match {
        case s: PStream =>
          streamData(s, this) match {
            case Some(data) =>
              val n = s.dict.m.get("N") match {
                case Some(PNum(x)) => x.toInt; case _ => return Array.empty
              }
              val first = s.dict.m.get("First") match {
                case Some(PNum(x)) => x.toInt; case _ => return Array.empty
              }
              val hdr = new Lexer(data, 0)
              val offs = new Array[Int](n)
              var i = 0
              while (i < n) {
                hdr.token() // object number (positional — index is the key)
                val t = hdr.token()
                if (!t.forall(_.isDigit) || t.isEmpty) return Array.empty
                offs(i) = t.toInt
                i += 1
              }
              offs.map { o =>
                if (first + o >= data.length) PNull
                else new Lexer(data, first + o).value()
              }
            case None => Array.empty
          }
        case _ => Array.empty
      }
  }

  /** Decoded stream data, or None when the filter chain fails. */
  private def streamData(s: PStream, r: Resolver): Option[Array[Byte]] = {
    val filters: Seq[String] = r(s.dict.m.getOrElse("Filter", PNull)) match {
      case PName(n) => Seq(n)
      case PArr(items) => items.map { case PName(n) => n; case _ => "?" }
      case _ => Seq.empty
    }
    filters.foldLeft(Option(s.raw)) {
      case (Some(data), "FlateDecode") => inflateZlib(data)
      case (Some(_), _) => None // DCT/LZW/... out of subset → page fails
      case (None, _) => None
    }
  }

  private def inflateZlib(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater() // zlib wrapper, adler-checked
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
          inf.end(); return None // truncated / dictionary
        }
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  // ------------------------------------------------------ text extraction

  /** Text operators over one page's concatenated content stream.
    * `Td`/`TD`/`T*`/`'`/`"` start a new line; `Tj`/`'`/`"` show a
    * string; `TJ` shows its array's strings (kerning numbers ignored).
    */
  private[operators] def extractText(content: Array[Byte]): String = {
    val lx = new Lexer(content, 0)
    val sb = new StringBuilder
    var lineHasText = false
    val operands = mutable.Buffer.empty[Obj]
    def newline(): Unit =
      if (lineHasText) { sb.append('\n'); lineHasText = false }
    def show(o: Obj): Unit = o match {
      case PStr(bytes) =>
        sb.append(new String(bytes, "ISO-8859-1"))
        lineHasText = true
      case _ => ()
    }
    while ({ lx.skipWs(); !lx.eof }) {
      val c = lx.cur
      if (c == '(' || c == '<' || c == '[' || c == '/' ||
        c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        operands += lx.value()
      } else {
        lx.token() match {
          case "" => if (!lx.eof) lx.pos += 1 // stray delimiter: consume
          case "Tj" => operands.lastOption.foreach(show)
          case "'" => newline(); operands.lastOption.foreach(show)
          case "\"" => newline(); operands.lastOption.foreach(show)
          case "TJ" => operands.lastOption match {
            case Some(PArr(items)) => items.foreach {
              case s: PStr => show(s)
              case _ => ()
            }
            case _ => ()
          }
          case "Td" | "TD" | "T*" => newline()
          case "ET" => newline()
          case _ => () // Tf, Tm, graphics ops — irrelevant to text
        }
        if (!lx.eof) operands.clear()
      }
    }
    if (sb.nonEmpty && sb.last == '\n') sb.deleteCharAt(sb.length - 1)
    sb.toString
  }

  // ------------------------------------------------------------ document

  /** Decode one PDF payload. */
  def decode(bytes: Array[Byte]): Doc = {
    if (bytes == null || bytes.length < 32) return fail()
    try {
      val head = new String(bytes, 0, math.min(16, bytes.length), "ISO-8859-1")
      if (!head.startsWith("%PDF-")) return fail()
      val version = head.substring(5, 8)
      // startxref: last occurrence in the final 2 KiB
      val tailStart = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailStart,
        bytes.length - tailStart, "ISO-8859-1")
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) return fail(version)
      val lx0 = new Lexer(bytes, tailStart + sx)
      lx0.token() // startxref
      val xrefOff = lx0.token().toInt
      val (offsets, trailer) = readXrefChain(bytes, xrefOff)
        .getOrElse(return fail(version))
      if (trailer.contains("Encrypt")) return fail(version)
      val r = new Resolver(bytes, offsets)

      val title = r(trailer.getOrElse("Info", PNull)) match {
        case PDict(m) => m.get("Title").map(r(_)) match {
          case Some(PStr(t)) => new String(t, "ISO-8859-1")
          case _ => ""
        }
        case _ => ""
      }

      val root = r(trailer.getOrElse("Root", PNull)) match {
        case d: PDict => d
        case _ => return fail(version)
      }
      // page tree walk (kids order, nested /Pages nodes)
      def walk(node: Obj, depth: Int): Seq[PDict] = r(node) match {
        case d: PDict if depth < 64 =>
          d.m.get("Type") match {
            case Some(PName("Pages")) => r(d.m.getOrElse("Kids", PNull)) match {
              case PArr(kids) => kids.flatMap(walk(_, depth + 1))
              case _ => Seq.empty
            }
            case Some(PName("Page")) => Seq(d)
            case _ => Seq.empty
          }
        case _ => Seq.empty
      }
      val pageDicts = walk(root.m.getOrElse("Pages", PNull), 0)

      val pages = pageDicts.map { pd =>
        val refs: Seq[Obj] = pd.m.get("Contents") match {
          case Some(a: PArr) => a.items
          case Some(o) => Seq(o)
          case None => Seq.empty
        }
        val datas = refs.map(c => r(c) match {
          case s: PStream => streamData(s, r)
          case _ => None
        })
        if (datas.exists(_.isEmpty)) Page(ok = false, "")
        else {
          val all = new java.io.ByteArrayOutputStream()
          datas.foreach { d => all.write(d.get); all.write('\n') }
          Page(ok = true, extractText(all.toByteArray))
        }
      }
      Doc(ok = true, version, offsets.size, title, pages)
    } catch { case _: Exception => fail() }
  }

  // ------------------------------------------------------------- encoder

  private def escapeString(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case '\r' => "\\r"
      case c => c.toString
    }

  private def deflateZlib(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** One page's deflated content stream (optionally truncated 40
    * bytes short — deterministically undecodable, the page-quarantine
    * witness; `/Length` stays consistent with the cut).
    */
  private def contentStream(text: String, truncate: Boolean): Array[Byte] = {
    val body = new StringBuilder("BT /F1 12 Tf 14 TL 72 720 Td\n")
    val lines = text.split("\n", -1)
    for ((line, j) <- lines.zipWithIndex) {
      body.append('(').append(escapeString(line)).append(") Tj\n")
      if (j < lines.length - 1) body.append("T*\n")
    }
    body.append("ET")
    val full = deflateZlib(body.toString.getBytes("ISO-8859-1"))
    if (truncate) java.util.Arrays.copyOf(full, math.max(2, full.length - 40))
    else full
  }

  /** Serialize pages (one string each; embedded `\n` become `T*` line
    * advances) as a classic-xref PDF 1.4 with FlateDecode content
    * streams, a Type1 Helvetica resource, an Info `/Title`, and a
    * correct xref table. `truncateStreamOf` cuts that page's stream 40
    * bytes short (consistent `/Length`) — deterministically
    * undecodable, the page-quarantine witness.
    */
  def encode(
      pageTexts: Seq[String],
      title: String,
      truncateStreamOf: Set[Int] = Set.empty): Array[Byte] = {
    val n = pageTexts.length
    // object numbering: 1 catalog, 2 pages, 3..2+n page dicts,
    // 3+n..2+2n content streams, 3+2n font, 4+2n info
    val fontNum = 3 + 2 * n
    val infoNum = 4 + 2 * n
    val objs = mutable.Buffer.empty[(Int, Array[Byte])]
    objs += 1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes("ISO-8859-1")
    objs += 2 -> ("<< /Type /Pages /Kids [" +
      (0 until n).map(i => s"${3 + i} 0 R").mkString(" ") +
      s"] /Count $n >>").getBytes("ISO-8859-1")
    for (i <- 0 until n)
      objs += (3 + i) -> (s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + n + i} 0 R " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> >>")
        .getBytes("ISO-8859-1")
    for (i <- 0 until n) {
      val data = contentStream(pageTexts(i), truncateStreamOf.contains(i))
      val head = s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(head.getBytes("ISO-8859-1"))
      bos.write(data)
      bos.write("\nendstream".getBytes("ISO-8859-1"))
      objs += (3 + n + i) -> bos.toByteArray
    }
    objs += fontNum ->
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        .getBytes("ISO-8859-1")
    objs += infoNum ->
      s"<< /Title (${escapeString(title)}) >>".getBytes("ISO-8859-1")

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n%\u00e2\u00e3\u00cf\u00d3\n") // binary-marker comment
    val offsets = mutable.Map.empty[Int, Int]
    for ((num, body) <- objs) {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); out.write(body); w("\nendobj\n")
    }
    val xrefOff = out.size()
    val total = infoNum + 1
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    for (num <- 1 until total)
      w(f"${offsets(num)}%010d 00000 n \n")
    w(s"trailer\n<< /Size $total /Root 1 0 R /Info $infoNum 0 R >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The same document as [[encode]] in MODERN (PDF 1.5) layout: every
    * dict object packed into one `/Type /ObjStm` object stream, the
    * cross-reference as a FlateDecode xref STREAM with typed `/W
    * [1 4 2]` rows under PNG predictor 12 (Up) — the shape every
    * contemporary writer emits. Content streams stay direct (the spec
    * forbids streams inside an ObjStm).
    */
  def encodeModern(
      pageTexts: Seq[String],
      title: String,
      truncateStreamOf: Set[Int] = Set.empty): Array[Byte] = {
    val n = pageTexts.length
    val fontNum = 3 + 2 * n
    val infoNum = 4 + 2 * n
    val objStmNum = 5 + 2 * n
    val xrefNum = 6 + 2 * n

    val packed: Seq[(Int, String)] = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> ("<< /Type /Pages /Kids [" +
        (0 until n).map(i => s"${3 + i} 0 R").mkString(" ") +
        s"] /Count $n >>")) ++
      (0 until n).map(i => (3 + i) -> (s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + n + i} 0 R " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> >>")) ++ Seq(
      fontNum -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      infoNum -> s"<< /Title (${escapeString(title)}) >>")
    val bodies = packed.map(_._2.getBytes("ISO-8859-1"))
    val relOffs = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = packed.zip(relOffs)
      .map { case ((num, _), o) => s"$num $o" }.mkString(" ") + "\n"
    val stmPlain = new java.io.ByteArrayOutputStream()
    stmPlain.write(header.getBytes("ISO-8859-1"))
    bodies.foreach { bb => stmPlain.write(bb); stmPlain.write('\n') }
    val stmData = deflateZlib(stmPlain.toByteArray)

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n%\u00e2\u00e3\u00cf\u00d3\n") // binary-marker comment
    val contentOffs = new Array[Int](n)
    for (i <- 0 until n) {
      val data = contentStream(pageTexts(i), truncateStreamOf.contains(i))
      contentOffs(i) = out.size()
      w(s"${3 + n + i} 0 obj\n<< /Length ${data.length} " +
        "/Filter /FlateDecode >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    val objStmOff = out.size()
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${packed.length} " +
      s"/First ${header.length} /Length ${stmData.length} " +
      "/Filter /FlateDecode >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")

    val xrefOff = out.size()
    val size = xrefNum + 1
    val cols = 7 // 1 + 4 + 2
    val rows = new Array[Byte](size * cols)
    def row(num: Int, t: Int, f2: Long, f3: Int): Unit = {
      val p = num * cols
      rows(p) = t.toByte
      rows(p + 1) = ((f2 >> 24) & 0xff).toByte
      rows(p + 2) = ((f2 >> 16) & 0xff).toByte
      rows(p + 3) = ((f2 >> 8) & 0xff).toByte
      rows(p + 4) = (f2 & 0xff).toByte
      rows(p + 5) = ((f3 >> 8) & 0xff).toByte
      rows(p + 6) = (f3 & 0xff).toByte
    }
    row(0, 0, 0L, 0xffff)
    for ((num, idx) <- packed.map(_._1).zipWithIndex)
      row(num, 2, objStmNum.toLong, idx)
    for (i <- 0 until n) row(3 + n + i, 1, contentOffs(i).toLong, 0)
    row(objStmNum, 1, objStmOff.toLong, 0)
    row(xrefNum, 1, xrefOff.toLong, 0)
    // PNG Up filter per row (predictor 12): filt = cur - prior mod 256
    val filtered = new Array[Byte](size * (cols + 1))
    for (r <- 0 until size) {
      filtered(r * (cols + 1)) = 2 // Up
      for (i <- 0 until cols) {
        val cur = rows(r * cols + i) & 0xff
        val prior = if (r > 0) rows((r - 1) * cols + i) & 0xff else 0
        filtered(r * (cols + 1) + 1 + i) = ((cur - prior) & 0xff).toByte
      }
    }
    val xrefData = deflateZlib(filtered)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /Root 1 0 R " +
      s"/Info $infoNum 0 R /W [1 4 2] /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Columns 7 >> " +
      s"/Length ${xrefData.length} >>\nstream\n")
    out.write(xrefData)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark

  final case class DocRow(
      doc_id: Long,
      ok: Boolean,
      version: String,
      n_objects: Int,
      title: String,
      n_pages: Int,
      n_pages_ok: Int,
      text: String) // ok pages joined with \n

  /** Partition-parallel decode over (doc_id, payload). */
  def decodeDocs(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[DocRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val d = decode(bytes)
        DocRow(id, d.ok, d.version, d.nObjects, d.title,
          d.pages.length, d.pages.count(_.ok),
          d.pages.filter(_.ok).map(_.text).mkString("\n"))
      })
  }
}
