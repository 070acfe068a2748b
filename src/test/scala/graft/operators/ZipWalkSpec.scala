package graft.operators

import graft.SparkSpec

/** APPNOTE grammar witnesses: stored/deflate round trips, comment-tail
  * EOCD scan, CRC gating, per-entry quarantine with directory
  * continuation, archive-level quarantine, encrypted surfacing, ZIP64
  * rejection, interop with the JDK's own writer, Spark fan-out.
  */
class ZipWalkSpec extends SparkSpec {

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("stored + deflate entries round-trip byte-exact, methods reported") {
    val zip = ZipWalk.fixture(Seq(
      ("a.txt", bytes("alpha"), false),
      ("b/long.txt", bytes("beta " * 400), true)))
    val es = ZipWalk.entries(zip)
    assert(es.map(_.name) === Seq("a.txt", "b/long.txt"))
    assert(es.map(_.method) === Seq(0, 8))
    assert(es.forall(!_.corrupt))
    assert(new String(es(0).data, "UTF-8") === "alpha")
    assert(new String(es(1).data, "UTF-8") === "beta " * 400)
    // deflate actually compressed the repetitive payload
    assert(es(1).compressedSize < es(1).uncompressedSize)
  }

  test("EOCD found through an archive comment; empty archive walks") {
    val zip = ZipWalk.fixture(Seq(("x", bytes("x"), true)),
      comment = bytes("trailing comment " * 10))
    assert(ZipWalk.entries(zip).map(_.corrupt) === Seq(false))
    assert(ZipWalk.entries(ZipWalk.fixture(Seq.empty)) === Seq.empty)
  }

  test("a flipped central CRC quarantines THAT entry, the rest decode") {
    val zip = ZipWalk.fixture(Seq(
      ("good1", bytes("one"), true),
      ("bad", bytes("two"), false),
      ("good2", bytes("three"), true)), corruptCrcAt = Set(1))
    val es = ZipWalk.entries(zip)
    assert(es.map(e => (e.name, e.corrupt)) ===
      Seq(("good1", false), ("bad", true), ("good2", false)))
    assert(es(1).data === null)
    assert(new String(es(2).data, "UTF-8") === "three")
  }

  test("archive-level corruption: no EOCD, truncated tail, garbage") {
    for (b <- Seq(bytes("not a zip at all, definitely not"),
      ZipWalk.fixture(Seq(("x", bytes("hello"), true))).dropRight(4),
      Array.empty[Byte])) {
      val es = ZipWalk.entries(b)
      assert(es.length === 1 && es.head.corrupt && es.head.name == null)
    }
  }

  test("truncated deflate data inside an intact directory is entry-corrupt") {
    val zip = ZipWalk.fixture(Seq(("x", bytes("abcdefgh" * 100), true)))
    // zero out the deflate stream (after the local header), staying
    // inside the data span — the directory must survive intact
    val csize = ZipWalk.entries(zip).head.compressedSize.toInt
    val smashed = zip.clone()
    val start = 30 + 1 // local header + name "x"
    for (i <- start until start + math.min(csize, 20)) smashed(i) = 0
    val es = ZipWalk.entries(smashed)
    assert(es.map(e => (e.name, e.corrupt)) === Seq(("x", true)))
  }

  test("encrypted entries surface with data withheld, not corrupt") {
    val zip = ZipWalk.fixture(Seq(("sec", bytes("secret"), false)))
    // set general-purpose bit 0 in the CENTRAL header (it follows the
    // local record: find the central signature and poke flags at +8)
    var cd = -1
    for (i <- zip.indices.dropRight(3))
      if (cd < 0 && zip(i) == 0x50 && zip(i + 1) == 0x4b &&
        zip(i + 2) == 0x01 && zip(i + 3) == 0x02) cd = i
    zip(cd + 8) = (zip(cd + 8) | 0x01).toByte
    val es = ZipWalk.entries(zip)
    assert(es.head.encrypted && !es.head.corrupt && es.head.data == null)
  }

  test("ZIP64 sentinels WITHOUT the locator/record reject the archive loudly") {
    val zip = ZipWalk.fixture(Seq(("x", bytes("x"), false)))
    // EOCD is the last 22 bytes (no comment); set total entries = 0xFFFF
    // but provide no ZIP64 EOCD structures — saturated and dangling
    val z64 = zip.clone()
    val eocd = z64.length - 22
    z64(eocd + 10) = 0xff.toByte; z64(eocd + 11) = 0xff.toByte
    val es = ZipWalk.entries(z64)
    assert(es.length === 1 && es.head.corrupt)
  }

  test("ZIP64: forced 64-bit fields round-trip through locator, record, and 0x0001 extras") {
    val zip = ZipWalk.fixture64(Seq(
      ("big/a.txt", bytes("alpha via zip64"), true),
      ("big/b.bin", bytes("beta stored " * 40), false),
      ("big/c.txt", bytes("gamma"), true)))
    val es = ZipWalk.entries(zip)
    assert(es.map(_.name) === Seq("big/a.txt", "big/b.bin", "big/c.txt"))
    assert(es.forall(e => !e.corrupt && !e.encrypted))
    assert(new String(es(0).data, "UTF-8") === "alpha via zip64")
    assert(new String(es(1).data, "UTF-8") === "beta stored " * 40)
    assert(es(1).uncompressedSize === ("beta stored " * 40).length.toLong)
    assert(new String(es(2).data, "UTF-8") === "gamma")
  }

  test("ZIP64: a smashed record signature quarantines the archive, not the JVM") {
    val zip = ZipWalk.fixture64(Seq(("x", bytes("x"), false)))
    // the ZIP64 EOCD record sits 56+20+22 bytes from the end; break its sig
    val smashed = zip.clone()
    smashed(smashed.length - 98) = 0x51
    val es = ZipWalk.entries(smashed)
    assert(es.length === 1 && es.head.corrupt)
  }

  test("interop: archives written by the JDK's ZipOutputStream walk clean") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    for ((n, d) <- Seq("j1.txt" -> "from the jdk", "dir/j2.txt" -> ("x" * 5000))) {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(bytes(d)); zos.closeEntry()
    }
    zos.close()
    // ZipOutputStream writes bit-3 data descriptors: local sizes are 0,
    // the central values drive the walk — exactly the contract
    val es = ZipWalk.entries(bos.toByteArray)
    assert(es.map(_.name) === Seq("j1.txt", "dir/j2.txt"))
    assert(es.forall(!_.corrupt))
    assert(new String(es(0).data, "UTF-8") === "from the jdk")
    assert(es(1).uncompressedSize === 5000L)
  }

  test("parseEntries fans archives out partition-parallel") {
    import spark.implicits._
    val rows = (0L until 8L).map { i =>
      (i, ZipWalk.fixture(Seq(
        (s"d$i/a.txt", bytes(s"doc $i alpha"), i % 2 == 0),
        (s"d$i/b.txt", bytes(s"doc $i beta"), true)),
        corruptCrcAt = if (i % 4 == 1) Set(0) else Set.empty))
    }.toDF("doc_id", "payload").repartition(4)
    val es = ZipWalk.parseEntries(rows)(spark).collect()
    assert(es.length === 16)
    assert(es.count(_.corrupt) === 2) // i = 1, 5
    assert(es.filter(e => !e.corrupt && e.name.endsWith("a.txt"))
      .forall(e => e.body_text.endsWith("alpha")))
  }
}
