package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC + multi-member-gzip walk invariants: real deflate round trips,
  * CRC gating, member-boundary resynchronization after corruption, and
  * the plain-.warc path.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def recs(n: Int) = (0 until n).map(i =>
    (s"urn:doc:$i", "response", s"body text number $i, length varies ${"x" * (i % 7)}"
      .getBytes("UTF-8")))

  test("gz round trip: every record back, offsets at member boundaries, bytes exact") {
    val rs = recs(5)
    val bytes = Warc.fixtureGz(rs)
    val out = Warc.records(bytes)
    assert(out.length === 5)
    assert(out.forall(!_.corrupt))
    out.zip(rs).foreach { case (got, (uri, t, body)) =>
      assert(got.warcType === t && got.targetUri === uri)
      assert(got.contentLength === body.length)
      assert(got.body.toSeq === body.toSeq)
    }
    // offsets strictly increase and start at 0 (member boundaries)
    assert(out.head.offset === 0L)
    assert(out.map(_.offset) === out.map(_.offset).sorted)
    assert(out.map(_.offset).distinct.length === 5)
  }

  test("a truncated member quarantines as ONE record; the walk resynchronizes") {
    val bytes = Warc.fixtureGz(recs(6), corruptAt = Set(2))
    val out = Warc.records(bytes)
    assert(out.length === 6)
    assert(out.count(_.corrupt) === 1)
    assert(out(2).corrupt)
    // the records after the corruption are intact
    assert(out(3).targetUri === "urn:doc:3" && out(5).targetUri === "urn:doc:5")
  }

  test("a flipped payload byte fails the member CRC — never silent wrong bytes") {
    val rs = recs(3)
    val bytes = Warc.fixtureGz(rs)
    val boundaries = Warc.records(bytes).map(_.offset)
    // flip one byte inside the middle member's deflate stream
    val bad = bytes.clone()
    bad(boundaries(1).toInt + 14) = (bad(boundaries(1).toInt + 14) ^ 0x40).toByte
    val out = Warc.records(bad)
    assert(out.count(_.corrupt) >= 1)
    assert(out.exists(r => !r.corrupt && r.targetUri == "urn:doc:0"),
      "records before the corruption survive")
    assert(out.exists(r => !r.corrupt && r.targetUri == "urn:doc:2"),
      "resync recovers records after the corruption")
  }

  test("plain (uncompressed) WARC concatenation parses; header absence tolerated") {
    val plain = new java.io.ByteArrayOutputStream()
    recs(3).foreach { case (uri, t, body) =>
      plain.write(
        (s"WARC/1.0\r\nWARC-Type: $t\r\nWARC-Target-URI: $uri\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1"))
      plain.write(body)
      plain.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    val out = Warc.records(plain.toByteArray)
    assert(out.length === 3 && out.forall(!_.corrupt))
    assert(out(1).targetUri === "urn:doc:1")
    // a record with no target-uri keeps "" and still parses
    val noUri = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    val o2 = Warc.records(noUri.getBytes("ISO-8859-1"))
    assert(o2.length === 1 && !o2.head.corrupt && o2.head.targetUri === "")
    assert(Warc.records("not a warc".getBytes("UTF-8")).head.corrupt)
    assert(Warc.records(Array.emptyByteArray).isEmpty)
  }

  test("parseRecords: partition-parallel, splittable-ingest shape") {
    val payloads = Seq(
      (0L, Warc.fixtureGz(recs(4))),
      (1L, Warc.fixtureGz(recs(2), corruptAt = Set(0))))
      .toDF("doc_id", "payload")
    val rows = Warc.parseRecords(payloads)(spark).collect()
    assert(rows.count(r => r.doc_id == 0L && !r.corrupt) === 4)
    assert(rows.count(r => r.doc_id == 1L && r.corrupt) === 1)
    assert(rows.count(r => r.doc_id == 1L && !r.corrupt) === 1)
    assert(rows.filter(!_.corrupt).forall(r => r.body_text.startsWith("body text")))
  }
}
