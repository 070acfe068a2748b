package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Packing invariants: offsets tile the token stream with no gap and no
  * overlap, packs cut exactly at the budget, partitions pack
  * independently, and the assignment is deterministic.
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, String, Long)], budget: Long) =
    Pack.packSequences(
      rows.toDF("id", "part", "n").withColumn("text", lit("")),
      "id", col("n"), budget, Seq("part"))

  test("documents tile the stream: each starts where the previous ended") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "a", 30L))
    val got = pack(rows, 16)
      .select("id", "pack_id", "pack_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // cumulative starts: 0, 10, 30, 35 → packs 0, 0, 1, 2 at offsets 0, 10, 14, 3
    assert(got === Array((1L, 0L, 0L), (2L, 0L, 10L), (3L, 1L, 14L), (4L, 2L, 3L)))
  }

  test("a doc landing exactly on the boundary starts the next pack at offset 0") {
    val rows = Seq((1L, "a", 16L), (2L, "a", 4L))
    val got = pack(rows, 16).select("id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array((1L, 0L, 0L), (2L, 1L, 0L)))
  }

  test("partitions pack independently — ids interleaved across partitions") {
    val rows = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "a", 10L), (4L, "b", 10L))
    val got = pack(rows, 16).select("id", "part", "pack_id", "pack_offset")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, "a", 0L, 0L), (2L, "b", 0L, 0L),
      (3L, "a", 0L, 10L), (4L, "b", 0L, 10L)))
  }

  test("zero-token docs inherit the current position without advancing it") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 0L), (3L, "a", 6L))
    val got = pack(rows, 16).select("id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array((1L, 0L, 0L), (2L, 0L, 10L), (3L, 0L, 10L)))
  }

  test("composite partition keys pack independently per combination") {
    val rows = Seq(
      (1L, "en", "web", 10L), (2L, "en", "web", 10L),
      (3L, "en", "book", 10L), (4L, "fr", "web", 10L))
      .toDF("id", "lang", "src", "n")
    val got = Pack.packSequences(rows, "id", col("n"), 16, Seq("lang", "src"))
      .select("id", "pack_id", "pack_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // (en,web) packs 1+2 together; (en,book) and (fr,web) restart at 0
    assert(got === Array((1L, 0L, 0L), (2L, 0L, 10L), (3L, 0L, 0L), (4L, 0L, 0L)))
  }

  test("budget of 1 token gives every non-empty doc its own pack") {
    val rows = Seq((1L, "a", 3L), (2L, "a", 2L), (3L, "a", 1L))
    val got = pack(rows, 1).select("id", "pack_id").as[(Long, Long)]
      .collect().sortBy(_._1)
    // starts 0, 3, 5 → packs 0, 3, 5
    assert(got === Array((1L, 0L), (2L, 3L), (3L, 5L)))
  }

  test("plan is a single window shuffle on the partition key") {
    val plan = pack(Seq((1L, "a", 1L)), 8).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(part".r.findFirstIn(plan).isDefined, plan)
    assert("Exchange".r.findAllIn(plan).size === 1, s"extra shuffle:\n$plan")
  }
}
