package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunking covers every token, honors size/stride, no redundant tail") {
    // 10 tokens, size 8, stride 4 → starts 0 and 4 (4+8 ≥ 10, so no start 8)
    val df = Seq((1L, words(10))).toDF("doc_id", "text")
    val got = Chunk.chunkDocs(df, "doc_id", "text", 8, 4)
      .orderBy($"chunk_id")
      .select($"chunk_id", $"chunk_start", $"n_tokens", $"chunk_text")
      .as[(Int, Int, Int, String)].collect()
    assert(got.length === 2)
    assert(got(0) === ((0, 0, 8, (1 to 8).map("w" + _).mkString(" "))))
    assert(got(1) === ((1, 4, 6, (5 to 10).map("w" + _).mkString(" "))))
  }

  test("short and exact-fit docs emit one chunk; empty docs emit none") {
    val df = Seq((1L, words(3)), (2L, words(8)), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val got = Chunk.chunkDocs(df, "doc_id", "text", 8, 4)
      .select($"doc_id", $"n_tokens").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 8))
  }

  test("every token index is covered by at least one chunk") {
    for (n <- Seq(1, 7, 8, 9, 31, 32, 33, 100); (size, stride) <- Seq((8, 4), (8, 8), (5, 2))) {
      val df = Seq((1L, words(n))).toDF("doc_id", "text")
      val spans = Chunk.chunkDocs(df, "doc_id", "text", size, stride)
        .select($"chunk_start", $"n_tokens").as[(Int, Int)].collect()
      val covered = spans.flatMap { case (s, len) => s until (s + len) }.toSet
      assert(covered === (0 until n).toSet, s"n=$n size=$size stride=$stride")
      // no chunk is fully contained in its predecessor's window
      val ends = spans.sortBy(_._1).map { case (s, len) => s + len }
      assert(ends.sameElements(ends.sorted) && ends.distinct.length === ends.length,
        s"redundant tail at n=$n size=$size stride=$stride")
    }
  }

  test("chunking is a narrow plan: no Exchange") {
    val df = Seq((1L, words(20))).toDF("doc_id", "text")
    val plan = Chunk.chunkDocs(df, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
