package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the PERMISSIVE classification contract of [[RawIngest.jsonl]]:
  * corrupt ⇔ unparseable, missing fields are tolerance not corruption.
  */
class RawIngestSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "doc_id LONG, lang STRING, source STRING, n_chars LONG"

  test("valid, partial, truncated, and junk lines classify correctly") {
    val rows = RawIngest.jsonl(Seq(
        """{"doc_id":1,"lang":"en","source":"web","n_chars":120}""",
        """{"doc_id":2,"source":"books"}""", // missing fields: NOT corrupt
        """{"doc_id":3,"lang":"en","source":"web","n_ch""", // truncated
        """not json at all""",
        "").toDF("line"), "line", ddl)
      .select(col("is_corrupt"), col("rec.doc_id"), col("rec.n_chars"))
      .collect()
    assert(!rows(0).getBoolean(0) && rows(0).getLong(1) === 1L
      && rows(0).getLong(2) === 120L)
    assert(!rows(1).getBoolean(0) && rows(1).getLong(1) === 2L
      && rows(1).isNullAt(2)) // tolerated null field
    assert(rows(2).getBoolean(0) && rows(2).isNullAt(1))
    assert(rows(3).getBoolean(0))
    assert(rows(4).getBoolean(0))
  }

  test("a to_json round-trip truncated by 5 bytes is ALWAYS corrupt") {
    // the q_jsonl_ingest planting rule: n_chars is the last struct field,
    // so the cut lands inside `"n_chars":<digits>}` whatever the digit
    // count — proven here across magnitudes
    val lines = Seq((1L, "en", "web", 7L), (2L, "de", "cc", 12345L),
        (3L, null.asInstanceOf[String], "books", 9999999L))
      .toDF("doc_id", "lang", "source", "n_chars")
      .select(to_json(struct(col("doc_id"), col("lang"), col("source"),
        col("n_chars"))).as("line0"))
      .select(expr("substring(line0, 1, length(line0) - 5)").as("line"))
    val out = RawIngest.jsonl(lines, "line", ddl).collect()
    assert(out.forall(_.getAs[Boolean]("is_corrupt")))
  }

  test("splitCsvRecords: quoted newlines/commas/escaped quotes stay in one record") {
    val blob = "1,a,\"x, y\"\n" + // embedded comma
      "2,b,\"line one\nline two\"\n" + // embedded newline
      "3,c,\"he said \"\"hi\"\"\"\n" + // escaped quotes
      "4,d,plain\r\n" + // CRLF terminator
      "5,e,\"tail" // unterminated quote at EOF
    val recs = RawIngest.splitCsvRecords(blob)
    assert(recs.map(_._1) === Seq(
      "1,a,\"x, y\"",
      "2,b,\"line one\nline two\"",
      "3,c,\"he said \"\"hi\"\"\"",
      "4,d,plain",
      "5,e,\"tail"))
    assert(recs.map(_._2) === Seq(false, false, false, false, true))
    assert(RawIngest.splitCsvRecords("") === Seq.empty)
    assert(RawIngest.splitCsvRecords("\n\n") === Seq.empty) // blank lines drop
  }

  test("csv classification: type corruption quarantines, empty fields tolerate") {
    val blobs = Seq((0L,
      "1,web,\"text one\"\n" +
        "xBAD,cc,\"text two\"\n" + // unparseable doc_id → corrupt
        "3,books,\n" + // empty text → null, NOT corrupt
        "4,web,\"with \"\"quote\"\" and, comma\"\n" +
        "5,cc,\"unterminated")) // splitter flags → corrupt
      .toDF("blob_id", "blob")
    val parsed = RawIngest.csv(
      RawIngest.csvRecords(blobs, "blob_id", "blob"),
      "record", "doc_id LONG, source STRING, text STRING")
    val byId = parsed.collect().map(r =>
      r.getString(parsed.columns.indexOf("record")).takeWhile(_ != ',') ->
        r.getAs[Boolean]("is_corrupt")).toMap
    assert(byId("1") === false && byId("4") === false)
    assert(byId("xBAD") === true, "type-broken doc_id must quarantine")
    assert(byId("5") === true, "unterminated quote must quarantine")
    assert(byId("3") === false, "empty field is tolerance, not corruption")
    val r3 = parsed.filter(col("record").startsWith("3,")).select("rec.text").head()
    assert(r3.isNullAt(0))
    val r4 = parsed.filter(col("record").startsWith("4,")).select("rec.text").head()
    assert(r4.getString(0) === "with \"quote\" and, comma")
    val r2 = parsed.filter(col("record").startsWith("xBAD")).select("rec._corrupt_record").head()
    assert(!r2.isNullAt(0), "raw record retained for quarantine")
  }
}
