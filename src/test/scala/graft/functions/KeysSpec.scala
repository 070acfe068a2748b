package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class KeysSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("ripemd160 matches the published test vectors") {
    // vectors from the RIPEMD-160 paper (Dobbertin/Bosselaers/Preneel)
    assert(hex(AntelopeKeys.ripemd160(Array.emptyByteArray)) ===
      "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(hex(AntelopeKeys.ripemd160("abc".getBytes("UTF-8"))) ===
      "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(hex(AntelopeKeys.ripemd160("message digest".getBytes("UTF-8"))) ===
      "5d0689ef49d2fae572b881b123a85ffa21595f36")
    assert(hex(AntelopeKeys.ripemd160(
      "abcdefghijklmnopqrstuvwxyz".getBytes("UTF-8"))) ===
      "f71c27109c692c1b56bbdceb5b9d2865b3708dbc")
    assert(hex(AntelopeKeys.ripemd160(("1234567890" * 8).getBytes("UTF-8"))) ===
      "9b752e45573d4b39f4dbd3323cab82bf63326bfb")
  }

  test("base58 round-trips arbitrary payloads including leading zeros") {
    val cases = Seq(
      Array[Byte](0, 0, 1, 2, 3),
      Array[Byte](127, -1, 0, 33),
      (0 until 37).map(i => ((i * 7 + 1) % 256).toByte).toArray)
    cases.foreach { b =>
      assert(AntelopeKeys.base58Decode(AntelopeKeys.base58Encode(b))
        .get.toSeq === b.toSeq)
    }
    assert(AntelopeKeys.base58Decode("0OIl").isEmpty) // excluded alphabet chars
  }

  test("a real-world legacy key decodes with a valid checksum (proves ripemd160 in situ)") {
    // the well-known Antelope documentation key
    val legacy = "EOS6MRyAjQq8ud7hVNYcfnVPJqcVpscN5So8BhtHuGYqET5GDW5CV"
    val payload = AntelopeKeys.decode(legacy)
    assert(payload.isDefined, "checksum validation must pass on a real key")
    assert(payload.get.length === 33)
    // canonical and back
    val k1 = AntelopeKeys.normalize(legacy).get
    assert(k1.startsWith("PUB_K1_"))
    assert(AntelopeKeys.toLegacy(k1).get === legacy)
    assert(AntelopeKeys.normalize(k1).get === k1)
  }

  test("corrupted keys are rejected") {
    val legacy = "EOS6MRyAjQq8ud7hVNYcfnVPJqcVpscN5So8BhtHuGYqET5GDW5CV"
    val corrupted = legacy.dropRight(1) + (if (legacy.last == '2') '3' else '2')
    assert(AntelopeKeys.decode(corrupted).isEmpty)
    assert(AntelopeKeys.decode("PUB_K1_not_base58_0OIl").isEmpty)
    assert(AntelopeKeys.decode("XYZ123").isEmpty)
  }

  test("generated keys round-trip between forms deterministically") {
    (0 until 4).foreach { i =>
      val payload = (Array(0x02.toByte) ++
        (0 until 32).map(j => ((i * 7 + j * 13 + 1) % 256).toByte)).toArray
      val legacy = AntelopeKeys.encodeLegacy(payload)
      val k1 = AntelopeKeys.encodeK1(payload)
      assert(AntelopeKeys.normalize(legacy).get === k1)
      assert(AntelopeKeys.toLegacy(k1).get === legacy)
      assert(AntelopeKeys.decode(legacy).get.toSeq === payload.toSeq)
    }
  }
}
