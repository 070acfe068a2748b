package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization rules, one assertion per rule, plus the
  * registered-domain algorithm and the dedup aggregate.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalize($"url")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("canonicalize: each documented rule, one witness each") {
    assert(canon("HTTPS://WWW.Example.COM/Path/X") ===
      Seq("https://example.com/Path/X")) // scheme+host lowered, www stripped, PATH CASE KEPT
    assert(canon("https://example.com:443/x", "http://example.com:80/x") ===
      Seq("https://example.com/x", "http://example.com/x")) // default ports dropped
    assert(canon("http://example.com:8080/x") ===
      Seq("http://example.com:8080/x")) // non-default port kept
    assert(canon("https://example.com./x") ===
      Seq("https://example.com/x")) // trailing host dot
    assert(canon("https://example.com/a#frag", "https://example.com/a") ===
      Seq("https://example.com/a", "https://example.com/a")) // fragment dropped
    assert(canon("https://example.com", "https://example.com/") ===
      Seq("https://example.com/", "https://example.com/")) // empty path → /
    assert(canon("https://example.com?q=1") ===
      Seq("https://example.com/?q=1")) // query with no path
    assert(canon("https://example.com/a?b=2&a=1") ===
      Seq("https://example.com/a?b=2&a=1")) // query kept byte-for-byte
    assert(canon("no scheme here", "ftp//missing.colon", "") ===
      Seq(null, null, null)) // invalid shapes → null, not garbage
  }

  test("registeredDomain: two labels, listed two-level suffixes, bare hosts") {
    val rows = Seq("example.com", "a.b.example.com", "news.bbc.co.uk",
      "bbc.co.uk", "sub.x.com.au", "localhost", "co.uk")
      .toDF("host").select(UrlOps.registeredDomain($"host")).as[String].collect()
    assert(rows === Seq("example.com", "example.com", "bbc.co.uk",
      "bbc.co.uk", "x.com.au", "localhost", "co.uk"))
  }

  test("dedupByCanonicalUrl: smallest id wins, counts exact, invalid dropped") {
    val df = Seq(
      (10L, "https://Example.com/a"),
      (3L, "https://example.com:443/a"), // same canonical, smaller id
      (7L, "https://example.com/b"),
      (9L, "not a url")
    ).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonicalUrl(df, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      ("https://example.com/a", 3L, 2L),
      ("https://example.com/b", 7L, 1L)))
  }

  test("whole pipeline stays in whole-stage codegen: no UDF, no extra exchange") {
    val df = Seq((1L, "https://example.com/a")).toDF("doc_id", "url")
    val plan = UrlOps.dedupByCanonicalUrl(df, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Invoke"),
      s"canonicalization must be codegen string functions:\n$plan")
  }
}
