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
}
