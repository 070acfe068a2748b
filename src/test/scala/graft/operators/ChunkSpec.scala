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

  private def draw32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)

  /** Independent CDC reference: cut after char i+k-1 (1-based i) when the
    * gram draw is 0 mod 2^maskBits; bounds 0 ‖ cuts<n ‖ n.
    */
  private def cdcRef(t: String, k: Int, maskBits: Int): Seq[(Int, Int, String)] = {
    val n = t.length
    val cuts = (1 to n - k + 1)
      .filter(i => draw32(t.substring(i - 1, i - 1 + k)) % (1L << maskBits) == 0)
      .map(_ + k - 1).filter(c => c < n)
    val bounds = 0 +: cuts :+ n
    bounds.zip(bounds.tail).zipWithIndex.map { case ((a, b), idx) =>
      (idx, a, t.substring(a, b))
    }
  }

  test("contentDefinedChunks matches the independent per-position reference") {
    val rng = new scala.util.Random(11)
    val docs = (1L to 30L).map(i =>
      (i, (1 to 40 + rng.nextInt(200)).map(_ => ('a' + rng.nextInt(6)).toChar).mkString))
    val df = docs.toDF("doc_id", "text")
    val got = Chunk.contentDefinedChunks(df, "doc_id", "text", k = 8, maskBits = 4)
      .select($"doc_id", $"chunk_idx", $"chunk_start", $"chunk_len")
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._2, c._3, c._4)).toSeq).toMap
    docs.foreach { case (id, t) =>
      val exp = cdcRef(t, 8, 4).map { case (idx, a, chunk) => (idx, a, chunk.length) }
      assert(got(id) === exp, s"doc $id")
    }
  }

  test("CDC chunks tile the document exactly and short docs emit one chunk") {
    val df = Seq((1L, "abcdefghij" * 30), (2L, "tiny")).toDF("doc_id", "text")
    val rows = Chunk.contentDefinedChunks(df, "doc_id", "text", k = 6, maskBits = 3)
      .select($"doc_id", $"chunk_start", $"chunk_len")
      .as[(Long, Int, Int)].collect().groupBy(_._1)
    for ((id, cs) <- rows) {
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 === 0)
      sorted.sliding(2).foreach {
        case Array((_, a, la), (_, b, _)) => assert(a + la === b, s"gap in doc $id")
        case _ =>
      }
    }
    assert(rows(2L).toSeq === Seq((2L, 0, 4)), "sub-k doc = one whole-doc chunk")
  }

  test("CDC is shift-stable: an inserted prefix keeps every later chunk hash") {
    val base = (1 to 400).map(i => ('a' + (i * 7 % 11) % 26).toChar).mkString
    val df = Seq((1L, base), (2L, "ZZZ" + base)).toDF("doc_id", "text")
    val hashes = Chunk.contentDefinedChunks(df, "doc_id", "text", k = 8, maskBits = 4)
      .select($"doc_id", $"chunk_hash").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val shared = hashes(1L).intersect(hashes(2L)).size
    // only the chunks overlapping the edit region may differ
    assert(shared >= hashes(1L).size - 2,
      s"CDC must re-align after an insertion: ${hashes(1L).size} vs shared $shared")
    assert(shared < hashes(1L).size, "the edited head chunk itself must differ")
  }

  /** Independent XOR-gear reference: plain rolling loop, no closed form. */
  private def gearRef(t: String, maskBits: Int): Seq[(Int, Int)] = {
    val bytes = t.getBytes("UTF-8")
    val mask = (1L << maskBits) - 1
    var h = 0L
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    // ASCII fixtures: byte index == char index
    bytes.indices.foreach { i =>
      h = ((h << 1) ^ graft.exprs.GearCuts.gear(bytes(i) & 0xFF)) & 0xFFFFFFFFL
      if ((h & mask) == 0L && i + 1 < t.length) cuts += (i + 1)
    }
    val bounds = 0 +: cuts.toSeq :+ t.length
    bounds.zip(bounds.tail).map { case (a, b) => (a, b - a) }
  }

  test("gear CDC matches the independent rolling-loop reference") {
    val rng = new scala.util.Random(31)
    val docs = (1L to 25L).map(i =>
      (i, (1 to 100 + rng.nextInt(300)).map(_ => ('a' + rng.nextInt(8)).toChar).mkString))
    val got = Chunk.contentDefinedChunksFast(docs.toDF("doc_id", "text"),
        "doc_id", "text", maskBits = 4)
      .select($"doc_id", $"chunk_idx", $"chunk_start", $"chunk_len")
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq).toMap
    docs.foreach { case (id, t) =>
      assert(got(id) === gearRef(t, 4), s"doc $id")
    }
  }

  test("gear CDC re-aligns within its 32-byte window after an insertion") {
    val base = (1 to 600).map(i => ('a' + (i * 13 % 17) % 26).toChar).mkString
    val df = Seq((1L, base), (2L, "PREFIX-" + base)).toDF("doc_id", "text")
    val hashes = Chunk.contentDefinedChunksFast(df, "doc_id", "text", maskBits = 4)
      .select($"doc_id", $"chunk_hash").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val shared = hashes(1L).intersect(hashes(2L)).size
    assert(shared >= hashes(1L).size - 3,
      s"gear must re-align after an edit: ${hashes(1L).size} vs shared $shared")
  }

  test("gear CDC is a narrow plan with no digest in the hot loop") {
    val df = Seq((1L, "abcdef" * 50)).toDF("doc_id", "text")
    val plan = Chunk.contentDefinedChunksFast(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("contentDefinedChunks is a narrow plan: no Exchange, no UDF") {
    val df = Seq((1L, "abcdef" * 50)).toDF("doc_id", "text")
    val plan = Chunk.contentDefinedChunks(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"),
      s"unexpected shuffle/UDF:\n$plan")
  }
}
