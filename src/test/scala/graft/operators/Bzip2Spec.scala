package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream

/** The from-spec bzip2 decoder against the REAL encoder
  * (commons-compress, on the Spark classpath): every block size,
  * every entropy regime, multi-stream concatenation, and both CRC
  * gates actually gating.
  */
class Bzip2Spec extends AnyFunSuite {

  private def check(p: Prop, min: Int = 40): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private def compress(data: Array[Byte], level: Int = 9): Array[Byte] = {
    val mem = new java.io.ByteArrayOutputStream()
    val bz = new BZip2CompressorOutputStream(mem, level)
    bz.write(data); bz.close()
    mem.toByteArray
  }

  private def corpora: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte](65),
    "rle-heavy" -> Array.fill[Byte](120000)('x'), // exercises the outer RLE
    "run-boundary" -> (Array.fill[Byte](4)('a') ++ Array.fill[Byte](259)('b') ++
      Array.fill[Byte](255 + 4)('c') ++ "tail".getBytes), // exact RLE counts 0/255
    "text" -> (0 until 9000).map(i => s"paragraph $i: shared phrasing, kind ${i % 17}\n")
      .mkString.getBytes("UTF-8"),
    "random" -> { val r = new scala.util.Random(31); val a = new Array[Byte](80000); r.nextBytes(a); a },
    "all-bytes" -> Array.tabulate[Byte](65536)(i => (i * 131 % 256).toByte),
    "multi-block" -> (0 until 60000).map(i => s"line $i tail ${i % 7}\n")
      .mkString.getBytes("UTF-8")) // > 100k at level 1: several blocks

  test("round-trips real bzip2 output at every block-size level") {
    for ((name, data) <- corpora; level <- Seq(1, 5, 9)) {
      val z = compress(data, level)
      val d = Bzip2Codec.decode(z)
      assert(d.isDefined, s"$name level $level must decode")
      assert(java.util.Arrays.equals(d.get, data), s"$name level $level")
    }
  }

  test("multi-stream concatenation (the pbzip2 splittable shape)") {
    val a = "first independent stream ".getBytes("UTF-8")
    val b = "second stream, different level".getBytes("UTF-8")
    val whole = compress(a, 1) ++ compress(b, 9)
    val d = Bzip2Codec.decode(whole)
    assert(d.isDefined && java.util.Arrays.equals(d.get, a ++ b))
  }

  test("block and stream CRCs actually gate") {
    val data = (0 until 3000).map(i => s"gate $i ").mkString.getBytes("UTF-8")
    val z = compress(data)
    // flip a mid-payload bit: huffman/BWT garbage must be caught by CRC
    var rejected = 0
    val r = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val bad = z.clone()
      val i = 12 + r.nextInt(z.length - 20)
      bad(i) = (bad(i) ^ (1 << r.nextInt(8))).toByte
      val d = Bzip2Codec.decode(bad)
      if (d.isEmpty || !java.util.Arrays.equals(d.get, data)) rejected += 1
      assert(d.isEmpty || java.util.Arrays.equals(d.get, data) || {
        // a flip that survives both CRC gates would be a 2^-64 event
        false
      }, "corrupt stream must never return wrong bytes")
    }
    assert(rejected === 50)
  }

  test("never throws on garbage and truncations") {
    val r = new scala.util.Random(17)
    val real = compress(corpora.toMap.apply("text"))
    for (_ <- 0 until 200) {
      val g = new Array[Byte](r.nextInt(150)); r.nextBytes(g)
      Bzip2Codec.decode(g)
      Bzip2Codec.decode(real.take(r.nextInt(real.length)))
    }
  }

  test("property: decode(realCompress(bytes)) == bytes") {
    val genBytes = for {
      n <- Gen.chooseNum(0, 5000)
      seed <- Gen.chooseNum(0, Int.MaxValue)
      mode <- Gen.oneOf(0, 1, 2, 3)
    } yield {
      val r = new scala.util.Random(seed)
      mode match {
        case 0 => val a = new Array[Byte](n); r.nextBytes(a); a
        case 1 => Array.tabulate[Byte](n)(i => (i % (1 + r.nextInt(4)) + 97).toByte)
        case 2 => Array.fill[Byte](n)((r.nextInt(3) + 97).toByte) // long runs
        case _ => (0 to n / 7).map(_ => s"w${r.nextInt(40)} ").mkString.getBytes("UTF-8").take(n)
      }
    }
    check(Prop.forAll(genBytes, Gen.oneOf(1, 3, 9)) { (data, level) =>
      val d = Bzip2Codec.decode(compress(data, level))
      d.isDefined && java.util.Arrays.equals(d.get, data)
    })
  }
}
