package graft.operators

import graft.SparkSpec

/** mbox/MIME witnesses: multipart + singlepart round trips (exact
  * text incl. trailing newlines), quoted-printable and base64 decode,
  * RFC 2047 encoded words (B and Q, adjacent-word joining), mboxrd
  * From-quoting, broken-boundary quarantine with mailbox continuation,
  * header unfolding, nested multiparts, unknown-encoding part
  * quarantine, Spark fan-out.
  */
class MimeWalkSpec extends SparkSpec {

  test("multipart and singlepart messages round-trip exact text") {
    val mbox = MimeWalk.fixture(Seq(
      ("a@x.com", "Hello A", "line one\nline two = tricky\n", true),
      ("b@y.com", "Hello B", "plain body\nwith trailing\n", false),
      ("c@z.com", "Hello C", "no trailing newline", true)))
    val ms = MimeWalk.parseMbox(mbox)
    assert(ms.length === 3)
    assert(ms.forall(!_.corrupt))
    assert(ms(0).textPlain === "line one\nline two = tricky\n")
    assert(ms(1).textPlain === "plain body\nwith trailing\n")
    assert(ms(2).textPlain === "no trailing newline")
    assert(ms.map(_.nParts) === Seq(2, 1, 2))
    assert(ms.map(_.subject) === Seq("Hello A", "Hello B", "Hello C"))
    assert(ms(0).from === "a@x.com")
  }

  test("quoted-printable: escapes, soft breaks, tolerant bad escapes") {
    assert(new String(MimeWalk.decodeQp("a=3Db"), "UTF-8") === "a=b")
    assert(new String(MimeWalk.decodeQp("long=\nline"), "UTF-8") === "longline")
    assert(new String(MimeWalk.decodeQp("soft=\r\nbreak"), "UTF-8") === "softbreak")
    assert(new String(MimeWalk.decodeQp("bad=zq"), "UTF-8") === "bad=zq")
    // encoder round trip over every printable + specials, long lines
    val body = ("x = y; 100% of [weird] chars: <>&\"'é\n" * 20)
    assert(new String(MimeWalk.decodeQp(
      MimeWalk.encodeQp(body.getBytes("UTF-8"))), "UTF-8") === body)
    // soft-wrapped lines stay under the RFC 76-char limit
    assert(MimeWalk.encodeQp(("z" * 500).getBytes("UTF-8"))
      .split("\n").forall(_.length <= 76))
  }

  test("RFC 2047 encoded words: B, Q, underscore-space, adjacent joining") {
    assert(MimeWalk.decodeWords("=?utf-8?B?SGVsbG8=?=") === "Hello")
    assert(MimeWalk.decodeWords("=?utf-8?Q?caf=C3=A9_au_lait?=") === "café au lait")
    // adjacent encoded words: separating whitespace dropped per spec
    assert(MimeWalk.decodeWords("=?utf-8?B?YWI=?= =?utf-8?B?Y2Q=?=") === "abcd")
    // plain runs kept
    assert(MimeWalk.decodeWords("plain =?utf-8?B?eA==?= tail") === "plain x tail")
  }

  test("mboxrd: body 'From ' lines are quoted out and unquoted back") {
    val body = "From the start of a line\n>From quoted already\nmid From ok"
    val mbox = MimeWalk.fixture(Seq(("a@x.com", "s", body, true)))
    val ms = MimeWalk.parseMbox(mbox)
    assert(ms.length === 1) // the body From line did NOT split the mailbox
    assert(ms.head.textPlain === body)
  }

  test("broken boundary quarantines the message, mailbox continues") {
    val mbox = MimeWalk.fixture(Seq(
      ("a@x.com", "ok1", "first", true),
      ("b@y.com", "broken", "never seen", true),
      ("c@z.com", "ok2", "third", true)), breakBoundaryOf = Set(1))
    val ms = MimeWalk.parseMbox(mbox)
    assert(ms.map(_.corrupt) === Seq(false, true, false))
    assert(ms(1).subject === "broken") // headers survive quarantine
    assert(ms(1).textPlain === "")
    assert(ms(2).textPlain === "third")
  }

  test("header unfolding and first-occurrence-wins") {
    val raw = ("From x Thu Jan  1 00:00:00 2026\n" +
      "Subject: part one\n\tpart two\n" +
      "X-Dup: first\nX-Dup: second\n" +
      "Content-Type: text/plain\n\nbody\n").getBytes("ISO-8859-1")
    val ms = MimeWalk.parseMbox(raw)
    assert(ms.head.subject === "part one part two")
    assert(ms.head.textPlain === "body\n")
  }

  test("nested multiparts recurse; unknown encodings quarantine the part") {
    val raw = ("From x Thu Jan  1 00:00:00 2026\n" +
      "Content-Type: multipart/mixed; boundary=\"outer\"\n\n" +
      "--outer\n" +
      "Content-Type: multipart/alternative; boundary=\"inner\"\n\n" +
      "--inner\n" +
      "Content-Type: text/plain\n\ninner plain\n" +
      "--inner--\n" +
      "--outer\n" +
      "Content-Type: text/plain\n" +
      "Content-Transfer-Encoding: x-uuencode\n\nopaque\n" +
      "--outer\n" +
      "Content-Type: text/plain\n\nouter plain\n" +
      "--outer--\n").getBytes("ISO-8859-1")
    val ms = MimeWalk.parseMbox(raw)
    assert(!ms.head.corrupt)
    assert(ms.head.nParts === 3)
    // the x-uuencode part is quarantined (ok=false) → not in textPlain
    assert(ms.head.textPlain === "inner plain\nouter plain")
  }

  test("parseMessages fans mailboxes out partition-parallel") {
    import spark.implicits._
    val rows = (0L until 4L).map { i =>
      (i, MimeWalk.fixture(Seq(
        (s"u$i@x.com", s"Doc $i", s"body of $i", i % 2 == 0)),
        breakBoundaryOf = if (i == 2) Set(0) else Set.empty)) // doc 2 is multipart
    }.toDF("doc_id", "payload").repartition(2)
    val ms = MimeWalk.parseMessages(rows)(spark).collect().sortBy(_.doc_id)
    assert(ms.length === 4)
    assert(ms.map(_.corrupt).toSeq === Seq(false, false, true, false))
    assert(ms(0).text_plain === "body of 0")
    assert(ms(1).text_plain === "body of 1")
  }
}
