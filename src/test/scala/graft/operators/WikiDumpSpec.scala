package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MediaWiki export-0.10 dump walk: page/revision skeleton, XML
  * unescape layering, CDATA, redirect attributes, multi-revision
  * ordering, and the torn-page quarantine-and-resync contract.
  */
class WikiDumpSpec extends SparkSpec {
  import WikiDump.{PageSpec, RevRow}

  private def page(id: Long, title: String, ns: Int = 0,
      redirect: Option[String] = None, texts: Seq[String]): PageSpec =
    PageSpec(id, title, ns, redirect,
      texts.zipWithIndex.map { case (t, i) =>
        (id * 10 + i, f"2020-01-01T00:00:${i}%02dZ", s"user${id % 5}", i % 2 == 1, t)
      })

  test("single page, single revision, escaped text round-trips") {
    val bytes = WikiDump.fixture(Seq(
      page(7, "A & B <C>", texts = Seq("x < y & z \"quoted\" 'apos'"))))
    val rows = WikiDump.revisions(1L, bytes)
    assert(rows.size === 1)
    val r = rows.head
    assert(!r.corrupt && r.page_id === 7 && r.title === "A & B <C>")
    assert(r.text === "x < y & z \"quoted\" 'apos'")
    assert(r.rev_id === 70 && r.rev_ordinal === 0 && r.rev_count === 1)
    assert(r.timestamp === "2020-01-01T00:00:00Z" && r.contributor === "user2")
    assert(!r.minor && r.ns === 0 && r.redirect == null)
  }

  test("multi-revision pages keep document order and per-rev fields") {
    val bytes = WikiDump.fixture(Seq(
      page(3, "Doc 3", texts = Seq("stub 0", "stub 1", "final text"))))
    val rows = WikiDump.revisions(1L, bytes)
    assert(rows.map(_.rev_ordinal) === Seq(0, 1, 2))
    assert(rows.map(_.rev_id) === Seq(30, 31, 32))
    assert(rows.map(_.minor) === Seq(false, true, false))
    assert(rows.last.text === "final text" && rows.last.rev_count === 3)
  }

  test("redirect attribute, namespaces, CDATA text") {
    val bytes = WikiDump.fixture(Seq(
      page(1, "Old & Name", redirect = Some("New & Target"),
        texts = Seq("#REDIRECT [[New & Target]]")),
      page(2, "Template:T", ns = 10, texts = Seq("{{{1}}}")),
      page(3, "CData", texts = Seq("raw <tag> & text"))), cdataPage = 2)
    val rows = WikiDump.revisions(0L, bytes)
    assert(rows(0).redirect === "New & Target")
    assert(rows(1).ns === 10 && rows(1).text === "{{{1}}}")
    assert(rows(2).text === "raw <tag> & text") // CDATA: literal, no unescape
  }

  test("torn page quarantines ONE row and resyncs at the next <page>") {
    val bytes = WikiDump.fixture(Seq(
      page(1, "Ok1", texts = Seq("a")),
      page(2, "Torn", texts = Seq("b0", "b1")),
      page(3, "Ok3", texts = Seq("c"))), tornPage = 1)
    val rows = WikiDump.revisions(0L, bytes)
    val (bad, good) = rows.partition(_.corrupt)
    assert(bad.size === 1) // one quarantine row for the torn page
    assert(good.map(_.page_id) === Seq(1, 3))
    assert(good.map(_.text) === Seq("a", "c"))
  }

  test("torn LAST page quarantines without a resync target") {
    val bytes = WikiDump.fixture(Seq(
      page(1, "Ok", texts = Seq("a")),
      page(2, "TornTail", texts = Seq("b"))), tornPage = 1)
    val rows = WikiDump.revisions(0L, bytes)
    assert(rows.count(_.corrupt) === 1)
    assert(rows.filter(!_.corrupt).map(_.page_id) === Seq(1))
  }

  test("xmlUnescape: five XML entities + numeric only; HTML names literal") {
    assert(WikiDump.xmlUnescape("&lt;&gt;&amp;&quot;&apos;") === "<>&\"'")
    assert(WikiDump.xmlUnescape("&#65;&#x42;") === "AB")
    // MediaWiki keeps HTML entities double-escaped; after XML unescape
    // they are the literal wikitext bytes — HtmlEntityDecode's job
    assert(WikiDump.xmlUnescape("&amp;ndash;") === "&ndash;")
    assert(WikiDump.xmlUnescape("&ndash;") === "&ndash;")
    assert(WikiDump.xmlUnescape("&#xD800;&#0;&#;") === "&#xD800;&#0;&#;")
  }

  test("distributed walk over shards + latest-revision selection") {
    import spark.implicits._
    val shards = (0L until 4L).map { shard =>
      (shard, WikiDump.fixture(
        (0 until 3).map(i => page(shard * 10 + i, s"P${shard * 10 + i}",
          texts = (0 to (i % 2)).map(r => s"rev$r of ${shard * 10 + i}")))))
    }.toDF("doc_id", "payload")
    val revs = WikiDump.parseRevisions(shards)
    val latest = Latest.argmax(revs.toDF(), Seq("page_id"), col("rev_ordinal"))
    assert(revs.count() === 4 * (1 + 2 + 1))
    assert(latest.count() === 12)
    val l5 = latest.filter(col("page_id") === 1).select("text").as[String].head()
    assert(l5 === "rev1 of 1")
  }
}
