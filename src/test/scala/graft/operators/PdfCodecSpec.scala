package graft.operators

import graft.SparkSpec

/** ISO 32000-1 subset witnesses: encoder round trips (lines, escapes,
  * title), page-level quarantine with document continuation,
  * document-level quarantine, COS grammar over a handcrafted raw PDF
  * (hex strings, name escapes, comments, indirect /Length, content
  * arrays, nested page tree), /Prev incremental-update chains,
  * text-operator semantics, encryption and xref-stream rejection,
  * Spark fan-out.
  */
class PdfCodecSpec extends SparkSpec {

  test("encode → decode round trip: pages, lines, title, structure") {
    val pdf = PdfCodec.encode(
      Seq("hello world\nsecond line\nthird", "page two text"), "My Title")
    val d = PdfCodec.decode(pdf)
    assert(d.ok && d.version === "1.4")
    assert(d.title === "My Title")
    assert(d.pages.map(_.ok) === Seq(true, true))
    assert(d.pages(0).text === "hello world\nsecond line\nthird")
    assert(d.pages(1).text === "page two text")
    assert(d.nObjects === 8) // catalog, pages, 2 page, 2 content, font, info
  }

  test("string escapes round trip: parens, backslashes, empty lines") {
    val text = "f(x) = \\frac{a}{b} (nested (parens))\n\nafter blank"
    val d = PdfCodec.decode(PdfCodec.encode(Seq(text), "t(1)\\x"))
    assert(d.pages.head.text === text)
    assert(d.title === "t(1)\\x")
  }

  test("truncated content stream fails THAT page, document continues") {
    val pdf = PdfCodec.encode(Seq("page one", "page two", "page three"),
      "T", truncateStreamOf = Set(1))
    val d = PdfCodec.decode(pdf)
    assert(d.ok)
    assert(d.pages.map(_.ok) === Seq(true, false, true))
    assert(d.pages(1).text === "")
    assert(d.pages(2).text === "page three")
  }

  test("document-level corruption fails loudly") {
    val good = PdfCodec.encode(Seq("x"), "t")
    val noHeader = "JUNK".getBytes("ISO-8859-1") ++ good.drop(4)
    val noTail = good.dropRight(30) // kills startxref/%%EOF
    assert(!PdfCodec.decode(noHeader).ok)
    assert(!PdfCodec.decode(noTail).ok)
    assert(!PdfCodec.decode(Array.empty[Byte]).ok)
    assert(!PdfCodec.decode(null).ok)
  }

  /** Assemble numbered objects with a correct classic xref. */
  private def assemble(objs: Seq[(Int, String)], trailerExtra: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offs = scala.collection.mutable.Map.empty[Int, Int]
    for ((n, body) <- objs) { offs(n) = out.size(); w(s"$n 0 obj\n$body\nendobj\n") }
    val xref = out.size()
    val total = objs.map(_._1).max + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    for (n <- 1 until total)
      w(f"${offs.getOrElse(n, 0)}%010d 00000 n \n")
    w(s"trailer\n<< /Size $total /Root 1 0 R $trailerExtra >>\n")
    w(s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  test("COS grammar: hex strings, name escapes, comments, indirect Length, content arrays, nested page tree") {
    val pdf = assemble(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      // nested tree: Pages → [Pages → [page 4], page 5]
      2 -> "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      3 -> "<< /Type /Pages /Kids [4 0 R] /Count 1 % a comment\n>>",
      4 -> "<< /Type /Page /Parent 3 0 R /Contents [6 0 R 7 0 R] >>",
      5 -> "<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>",
      // raw (unfiltered) streams; 6 has INDIRECT /Length
      6 -> "<< /Length 9 0 R >>\nstream\nBT (part one) Tj ET\nendstream",
      7 -> "<< /Length 19 >>\nstream\nBT (part two) Tj ET\nendstream",
      8 -> "<< /Length 20 >>\nstream\nBT (lone page) Tj ET\nendstream",
      9 -> "19",
      10 -> "<< /Title <486578486578486578> /X#20Y (name-escape key ok) >>"),
      "/Info 10 0 R")
    val d = PdfCodec.decode(pdf)
    assert(d.ok)
    // ET closes a text object → line break between the two content parts
    assert(d.pages.map(_.text) === Seq("part one\npart two", "lone page"))
    assert(d.title === "HexHexHex") // hex-string title
  }

  test("/Prev incremental update: latest xref section wins") {
    // base document, then an appended update that REDEFINES the info
    // object with a new title and chains to the base xref via /Prev
    val base = assemble(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      4 -> "<< /Length 17 >>\nstream\nBT (body) Tj ET\nendstream",
      5 -> "<< /Title (Old) >>"),
      "/Info 5 0 R")
    val baseXref = new String(base, "ISO-8859-1")
      .split("startxref\n")(1).split("\n")(0).toInt
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(base)
    val newOff2 = out2.size()
    def w2(s: String): Unit = out2.write(s.getBytes("ISO-8859-1"))
    w2("5 0 obj\n<< /Title (New) >>\nendobj\n")
    val xrefOff2 = out2.size()
    w2(f"xref\n5 1\n$newOff2%010d 00000 n \n")
    w2(s"trailer\n<< /Size 6 /Root 1 0 R /Info 5 0 R /Prev $baseXref >>\n")
    w2(s"startxref\n$xrefOff2\n%%EOF\n")
    val d = PdfCodec.decode(out2.toByteArray)
    assert(d.ok)
    assert(d.title === "New")
    assert(d.pages.map(_.text) === Seq("body"))
  }

  test("text operators: TJ arrays, quote operators, Td/T* lines") {
    val content = ("BT [(ab) -120 (cd)] TJ T* (next) Tj " +
      "(quoted) ' 2 3 (dquoted) \" ET").getBytes("ISO-8859-1")
    assert(PdfCodec.extractText(content) ===
      "abcd\nnext\nquoted\ndquoted")
  }

  test("encryption and a startxref into garbage reject the document loudly") {
    val enc = assemble(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [] /Count 0 >>"),
      "/Encrypt 9 0 R")
    assert(!PdfCodec.decode(enc).ok)
    // startxref pointing at a non-xref object (here: into the header)
    val good = PdfCodec.encode(Seq("x"), "t")
    val s = new String(good, "ISO-8859-1")
    val broken = s.replaceAll("startxref\n[0-9]+", "startxref\n9")
      .getBytes("ISO-8859-1")
    assert(!PdfCodec.decode(broken).ok)
  }

  test("modern layout: ObjStm + predictor-12 xref stream round-trips") {
    val text = Seq("modern page one\nline two", "modern page two")
    val m = PdfCodec.decode(PdfCodec.encodeModern(text, "Modern Title"))
    assert(m.ok && m.version === "1.5")
    assert(m.title === "Modern Title")
    assert(m.pages.map(_.text) === text)
    // classic and modern layouts agree on content
    val c = PdfCodec.decode(PdfCodec.encode(text, "Modern Title"))
    assert(m.pages.map(_.text) === c.pages.map(_.text))
    // page quarantine works through the ObjStm indirection too
    val t = PdfCodec.decode(PdfCodec.encodeModern(text, "T", Set(0)))
    assert(t.ok && t.pages.map(_.ok) === Seq(false, true))
    assert(t.pages(1).text === "modern page two")
  }

  test("pngUnpredict: every PNG filter type at bpp=1") {
    // rows of 3 columns; raw values chosen so each filter is exercised
    val raw = Seq(
      Seq(10, 20, 30), // row 0
      Seq(13, 24, 35), // row 1
      Seq(20, 30, 40), // row 2
      Seq(25, 37, 50), // row 3
      Seq(30, 45, 60)) // row 4
    def b(i: Int) = (i & 0xff).toByte
    val filtered = new java.io.ByteArrayOutputStream()
    // row 0: None — literal
    filtered.write(0); raw(0).foreach(v => filtered.write(v))
    // row 1: Sub — cur - left
    filtered.write(1)
    filtered.write(raw(1)(0)); filtered.write(raw(1)(1) - raw(1)(0))
    filtered.write(raw(1)(2) - raw(1)(1))
    // row 2: Up — cur - prior
    filtered.write(2); (0 until 3).foreach(i => filtered.write(raw(2)(i) - raw(1)(i)))
    // row 3: Average — cur - floor((left + prior)/2)
    filtered.write(3)
    filtered.write(raw(3)(0) - ((0 + raw(2)(0)) >> 1))
    filtered.write(raw(3)(1) - ((raw(3)(0) + raw(2)(1)) >> 1))
    filtered.write(raw(3)(2) - ((raw(3)(1) + raw(2)(2)) >> 1))
    // row 4: Paeth — cur - paeth(left, up, upleft)
    def paeth(a: Int, bb: Int, cc: Int): Int = {
      val p = a + bb - cc
      val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - cc)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else cc
    }
    filtered.write(4)
    filtered.write(raw(4)(0) - paeth(0, raw(3)(0), 0))
    filtered.write(raw(4)(1) - paeth(raw(4)(0), raw(3)(1), raw(3)(0)))
    filtered.write(raw(4)(2) - paeth(raw(4)(1), raw(3)(2), raw(3)(1)))
    val got = PdfCodec.pngUnpredict(filtered.toByteArray, 3).get
    assert(got.toSeq === raw.flatten.map(b))
    // malformed: not a multiple of columns+1
    assert(PdfCodec.pngUnpredict(Array[Byte](0, 1), 3).isEmpty)
  }

  test("decodeDocs fans documents out partition-parallel") {
    import spark.implicits._
    val rows = (0L until 6L).map { i =>
      (i, PdfCodec.encode(
        Seq(s"doc $i page 1", s"doc $i page 2"), s"Doc $i",
        truncateStreamOf = if (i % 3 == 1) Set(1) else Set.empty))
    }.toDF("doc_id", "payload").repartition(3)
    val ds = PdfCodec.decodeDocs(rows)(spark).collect().sortBy(_.doc_id)
    assert(ds.forall(_.ok))
    assert(ds.map(_.n_pages).toSeq === Seq.fill(6)(2))
    assert(ds.map(_.n_pages_ok).toSeq === Seq(2, 1, 2, 2, 1, 2))
    assert(ds(0).text === "doc 0 page 1\ndoc 0 page 2")
    assert(ds(1).text === "doc 1 page 1")
  }
}
