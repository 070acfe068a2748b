package graft

import graft.functions.AntelopeAbi
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

/** Grounds the pure-Scala ABI codec in PUBLIC serialization vectors (the
  * well-known `eosio` name constant and `1.0000 EOS` asset bytes every
  * Antelope tool emits), then locks the rest by encode↔decode round-trip
  * properties — so a symmetric encode/decode bug cannot hide.
  */
class AntelopeAbiSpec extends AnyFunSuite {

  private def check(p: Prop, min: Int = 100): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private val tokenAbi = AntelopeAbi.parseAbi(
    """{"version":"eosio::abi/1.2","structs":[
      {"name":"transfer","base":"","fields":[
        {"name":"from","type":"name"},{"name":"to","type":"name"},
        {"name":"quantity","type":"asset"},{"name":"memo","type":"string"}]}],
      "actions":[{"name":"transfer","type":"transfer"}]}""")

  // ------------------------------------------------------- published vectors

  test("name: the canonical eosio constant 0x5530EA0000000000") {
    assert(AntelopeAbi.stringToName("eosio") === 0x5530ea0000000000L)
    assert(AntelopeAbi.nameToString(0x5530ea0000000000L) === "eosio")
    // its little-endian serialization is the famous 0000000000ea3055
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    assert(AntelopeAbi.jsonToHex(abi, "name", "\"eosio\"") === "0000000000ea3055")
    assert(AntelopeAbi.hexToJson(abi, "name", "0000000000ea3055") === "\"eosio\"")
  }

  test("asset: 1.0000 EOS serializes to 102700000000000004454f5300000000") {
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    assert(AntelopeAbi.jsonToHex(abi, "asset", "\"1.0000 EOS\"")
      === "102700000000000004454f5300000000")
    assert(AntelopeAbi.hexToJson(abi, "asset", "102700000000000004454F5300000000")
      === "\"1.0000 EOS\"")
    assert(AntelopeAbi.hexToJson(abi, "symbol", "04454F5300000000") === "\"4,EOS\"")
    assert(AntelopeAbi.hexToJson(abi, "symbol_code", "454F530000000000") === "\"EOS\"")
  }

  test("transfer struct round-trips through its public field layout") {
    val json = """{"from":"alice","to":"bob","quantity":"1.0000 EOS","memo":"test"}"""
    val hex = AntelopeAbi.jsonToHex(tokenAbi, "transfer", json)
    // name(alice) ++ name(bob) ++ int64(10000) ++ symbol(4,EOS) ++ str(test)
    assert(hex.length === (8 + 8 + 8 + 8 + 1 + 4) * 2)
    assert(hex.endsWith("0474657374")) // varuint 4 + "test"
    assert(AntelopeAbi.hexToJson(tokenAbi, "transfer", hex) === json)
  }

  test("empty memo has no trailing padding (reference issue #133)") {
    val json = """{"from":"alice","to":"bob","quantity":"10.0000 EOS","memo":""}"""
    val hex = AntelopeAbi.jsonToHex(tokenAbi, "transfer", json)
    assert(hex.length === (8 + 8 + 16 + 1) * 2)
    assert(hex.endsWith("00"))
    assert(AntelopeAbi.hexToJson(tokenAbi, "transfer", hex) === json)
  }

  test("extra JSON fields are ignored when encoding (issue #133 filter)") {
    val clean = """{"from":"alice","to":"bob","quantity":"1.0000 EOS","memo":"test"}"""
    val extra = """{"from":"alice","to":"bob","quantity":"1.0000 EOS","memo":"test",
      "extra_field":"should_be_ignored","another_extra":123}"""
    assert(AntelopeAbi.jsonToHex(tokenAbi, "transfer", extra)
      === AntelopeAbi.jsonToHex(tokenAbi, "transfer", clean))
  }

  // ------------------------------------------------------------- name corpus

  test("names round-trip over the full 13-char alphabet") {
    val names = Seq("a", "eosio.token", "eosio.msig", "a.b.c", "zzzzzzzzzzzzj",
      "alice", "bob", "1", "5", "abcdefghijklm".take(12), "a..b")
    names.foreach { n =>
      assert(AntelopeAbi.nameToString(AntelopeAbi.stringToName(n)) === n, n)
    }
  }

  private val nameChar = Gen.oneOf(('a' to 'z') ++ ('1' to '5') :+ '.')
  test("property: any valid 1..12-char name value round-trips") {
    check(Prop.forAll(Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, nameChar))) {
      chars =>
        // trailing dots are non-canonical (value-preserving but not
        // string-preserving) — canonicalize like every public tool does
        val s = chars.mkString.reverse.dropWhile(_ == '.').reverse
        s.isEmpty || AntelopeAbi.nameToString(AntelopeAbi.stringToName(s)) == s
    }, min = 200)
  }

  // ----------------------------------------------------- scalar round-trips

  private val scalarAbi = AntelopeAbi.parseAbi(
    """{"version":"eosio::abi/1.2","structs":[
      {"name":"all","base":"","fields":[
        {"name":"b","type":"bool"},{"name":"u8","type":"uint8"},
        {"name":"i8","type":"int8"},{"name":"u16","type":"uint16"},
        {"name":"i16","type":"int16"},{"name":"u32","type":"uint32"},
        {"name":"i32","type":"int32"},{"name":"u64","type":"uint64"},
        {"name":"i64","type":"int64"},{"name":"u128","type":"uint128"},
        {"name":"i128","type":"int128"},{"name":"vu","type":"varuint32"},
        {"name":"vi","type":"varint32"},{"name":"f32","type":"float32"},
        {"name":"f64","type":"float64"},{"name":"s","type":"string"},
        {"name":"by","type":"bytes"},{"name":"c256","type":"checksum256"},
        {"name":"tp","type":"time_point"},{"name":"tps","type":"time_point_sec"},
        {"name":"bt","type":"block_timestamp_type"}]}]}""")

  test("the full scalar struct round-trips byte-exactly") {
    val json = """{"b":true,"u8":255,"i8":-128,"u16":65535,"i16":-32768,""" +
      """"u32":4294967295,"i32":-2147483648,"u64":"18446744073709551615",""" +
      """"i64":"-9223372036854775808","u128":"340282366920938463463374607431768211455",""" +
      """"i128":"-170141183460469231731687303715884105728","vu":624485,"vi":-300,""" +
      """"f32":1.5,"f64":-2.25,"s":"héllo \"w\"","by":"DEADBEEF",""" +
      """"c256":"""" + ("AB" * 32) + "\"," +
      """"tp":"2023-11-14T22:13:04.500","tps":"2023-11-14T22:13:04",""" +
      """"bt":"2023-11-14T22:13:04.500"}"""
    val hex = AntelopeAbi.jsonToHex(scalarAbi, "all", json)
    assert(AntelopeAbi.hexToJson(scalarAbi, "all", hex) === json)
  }

  test("LEB128 varuint32 uses the public encoding (624485 -> e58e26)") {
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    assert(AntelopeAbi.jsonToHex(abi, "varuint32", "624485") === "e58e26")
    assert(AntelopeAbi.hexToJson(abi, "varuint32", "e58e26") === "624485")
  }

  // ------------------------------------- composites: optional/array/variant

  private val compositeAbi = AntelopeAbi.parseAbi(
    """{"version":"eosio::abi/1.2",
      "types":[{"new_type_name":"account_name","type":"name"}],
      "structs":[
        {"name":"pair","base":"","fields":[
          {"name":"key","type":"account_name"},{"name":"value","type":"uint64"}]},
        {"name":"holder","base":"","fields":[
          {"name":"id","type":"uint32"},
          {"name":"maybe","type":"string?"},
          {"name":"owners","type":"account_name[]"},
          {"name":"pairs","type":"pair[]"},
          {"name":"which","type":"choice"},
          {"name":"ext","type":"uint16$"}]}],
      "variants":[{"name":"choice","types":["uint64","pair"]}]}""")

  test("optional present/absent, alias, nested array, variant arms, extension") {
    val full = """{"id":7,"maybe":"x","owners":["alice","bob"],""" +
      """"pairs":[{"key":"carol","value":"9"}],"which":["pair",{"key":"dave","value":"1"}],""" +
      """"ext":42}"""
    val hexFull = AntelopeAbi.jsonToHex(compositeAbi, "holder", full)
    assert(AntelopeAbi.hexToJson(compositeAbi, "holder", hexFull) === full)

    val absent = """{"id":7,"maybe":null,"owners":[],"pairs":[],"which":["uint64","5"]}"""
    val hexAbsent = AntelopeAbi.jsonToHex(compositeAbi, "holder", absent)
    // optional flag 0, empty arrays 00, variant idx 0 — and NO extension bytes
    assert(AntelopeAbi.hexToJson(compositeAbi, "holder", hexAbsent) === absent)
  }

  test("struct base fields decode before own fields") {
    val abi = AntelopeAbi.parseAbi(
      """{"version":"eosio::abi/1.2","structs":[
        {"name":"base_t","base":"","fields":[{"name":"a","type":"uint8"}]},
        {"name":"child","base":"base_t","fields":[{"name":"b","type":"uint8"}]}]}""")
    assert(AntelopeAbi.hexToJson(abi, "child", "0102") === """{"a":1,"b":2}""")
    assert(AntelopeAbi.jsonToHex(abi, "child", """{"a":1,"b":2}""") === "0102")
  }

  // ---------------- reference fixture set (tests/unit/hex-data-serialization
  // ---------------- .test.ts — the issue-#133 suite, ported vector-for-vector)

  test("variable-length memos: even-length hex, no trailing padding (#133)") {
    // the reference's exact memo sweep, incl. the delphioracle-style
    // variable-length tail it calls out
    val memos = Seq("", "a", "ab", "abc", "abcd",
      "this is a longer memo for testing")
    memos.foreach { memo =>
      val json = s"""{"from":"alice","to":"bob","quantity":"1.0000 EOS","memo":"$memo"}"""
      val hex = AntelopeAbi.jsonToHex(tokenAbi, "transfer", json)
      assert(hex.length % 2 === 0, s"odd hex for memo '$memo'")
      // fixed prefix (from, to, asset) + varuint len + utf8 bytes, nothing else
      assert(hex.length === (8 + 8 + 16 + 1 + memo.length) * 2, s"padding for '$memo'")
      assert(AntelopeAbi.hexToJson(tokenAbi, "transfer", hex) === json, memo)
    }
  }

  test("re-encode is byte-stable: hex -> json -> identical hex (#133 v1 path)") {
    // the v1 get_actions endpoint decodes stored data and re-encodes it as
    // hex_data; the #133 bug was the re-encode producing different bytes
    val vectors = Seq(
      """{"from":"alice","to":"bob","quantity":"1.0000 EOS","memo":"test"}""",
      """{"from":"alice","to":"bob","quantity":"10.0000 EOS","memo":""}""",
      """{"from":"zzzzzzzzzzzzj","to":"a","quantity":"0.0001 EOS","memo":"m"}""")
    vectors.foreach { json =>
      val hex1 = AntelopeAbi.jsonToHex(tokenAbi, "transfer", json)
      val hex2 = AntelopeAbi.jsonToHex(tokenAbi, "transfer",
        AntelopeAbi.hexToJson(tokenAbi, "transfer", hex1))
      assert(hex2 === hex1, json)
    }
  }

  // -------------------------------------------------------- time_point edges

  test("time_point edges: epoch, millis, pre-epoch; known little-endian bytes") {
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    // epoch is all-zero micros
    assert(AntelopeAbi.jsonToHex(abi, "time_point", "\"1970-01-01T00:00:00.000\"")
      === "0000000000000000")
    // 1 ms = 1000 micros = 0x3e8 LE
    assert(AntelopeAbi.jsonToHex(abi, "time_point", "\"1970-01-01T00:00:00.001\"")
      === "e803000000000000")
    // pre-epoch values are negative micros in two's complement
    val pre = "\"1969-12-31T23:59:59.500\""
    val preHex = AntelopeAbi.jsonToHex(abi, "time_point", pre)
    assert(AntelopeAbi.hexToJson(abi, "time_point", preHex) === pre)
    // .999 boundary round-trips
    val ms999 = "\"2023-11-14T22:13:04.999\""
    assert(AntelopeAbi.hexToJson(abi, "time_point",
      AntelopeAbi.jsonToHex(abi, "time_point", ms999)) === ms999)
  }

  test("time_point sub-millisecond micros: documented truncation divergence") {
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    // 1500 micros decodes to the canonical millisecond text form (.001),
    // like every public Antelope tool: the TEXT form floors sub-ms micros,
    // so byte-level round-trip through JSON is lossy below 1 ms BY DESIGN
    assert(AntelopeAbi.hexToJson(abi, "time_point", "dc05000000000000") // 1500
      === "\"1970-01-01T00:00:00.001\"")
    // time_point_sec likewise floors sub-second text to whole seconds
    assert(AntelopeAbi.jsonToHex(abi, "time_point_sec", "\"1970-01-01T00:00:01.900\"")
      === "01000000")
  }

  test("block_timestamp_type: 500ms slots since 2000-01-01 (slot vectors)") {
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    assert(AntelopeAbi.jsonToHex(abi, "block_timestamp_type",
      "\"2000-01-01T00:00:00.000\"") === "00000000") // slot 0
    assert(AntelopeAbi.jsonToHex(abi, "block_timestamp_type",
      "\"2000-01-01T00:00:00.500\"") === "01000000") // slot 1
    assert(AntelopeAbi.jsonToHex(abi, "block_timestamp_type",
      "\"2000-01-01T00:00:01.000\"") === "02000000") // slot 2
    val t = "\"2023-11-14T22:13:04.500\""
    assert(AntelopeAbi.hexToJson(abi, "block_timestamp_type",
      AntelopeAbi.jsonToHex(abi, "block_timestamp_type", t)) === t)
  }

  // --------------------------------------------------------- nested variants

  private val nestedVariantAbi = AntelopeAbi.parseAbi(
    """{"version":"eosio::abi/1.2",
      "structs":[
        {"name":"inner","base":"","fields":[
          {"name":"tag","type":"name"},{"name":"val","type":"leaf"}]},
        {"name":"outer","base":"","fields":[
          {"name":"items","type":"node[]"}]}],
      "variants":[
        {"name":"leaf","types":["uint8","string"]},
        {"name":"node","types":["inner","leaf"]}]}""")

  test("variants nest through structs and arrays (variant-in-variant)") {
    // node[] where each node is either a struct CONTAINING a variant, or a
    // bare variant — two levels of arm dispatch through one array
    val json = """{"items":[""" +
      """["inner",{"tag":"alice","val":["uint8",7]}],""" +
      """["leaf",["string","deep"]],""" +
      """["inner",{"tag":"bob","val":["string","x"]}]]}"""
    val hex = AntelopeAbi.jsonToHex(nestedVariantAbi, "outer", json)
    assert(AntelopeAbi.hexToJson(nestedVariantAbi, "outer", hex) === json)
    // arm indexes are varuint-encoded in declaration order: first item is
    // arm 0 ("inner"), whose val is leaf arm 0 (uint8)
    assert(hex.startsWith("03" + "00"), hex) // 3 items, arm 0
  }

  // ------------------------------------------------------------ error ladder

  test("truncated, trailing, unknown-type and bad-hex payloads all throw") {
    intercept[AntelopeAbi.AbiError](
      AntelopeAbi.hexToJson(tokenAbi, "transfer", "0000"))
    intercept[AntelopeAbi.AbiError]( // valid transfer + one trailing byte
      AntelopeAbi.hexToJson(tokenAbi, "transfer",
        AntelopeAbi.jsonToHex(tokenAbi, "transfer",
          """{"from":"a","to":"b","quantity":"1.0000 EOS","memo":""}""") + "ff"))
    intercept[AntelopeAbi.AbiError](
      AntelopeAbi.hexToJson(tokenAbi, "nosuchtype", "00"))
    intercept[AntelopeAbi.AbiError](
      AntelopeAbi.hexToJson(tokenAbi, "transfer", "zz"))
  }

  test("keys and signatures round-trip through their checked base58 forms") {
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    val payload = Array.tabulate[Byte](33)(i => ((i * 7 + 3) % 256).toByte)
    val k1 = graft.functions.AntelopeKeys.encodeChecked("PUB_K1_", payload, "K1")
    val hex = AntelopeAbi.jsonToHex(abi, "public_key", "\"" + k1 + "\"")
    assert(hex.startsWith("00"))
    assert(AntelopeAbi.hexToJson(abi, "public_key", hex) === "\"" + k1 + "\"")
    val sigPayload = Array.tabulate[Byte](65)(i => ((i * 11 + 5) % 256).toByte)
    val sig = graft.functions.AntelopeKeys.encodeChecked("SIG_K1_", sigPayload, "K1")
    val sigHex = AntelopeAbi.jsonToHex(abi, "signature", "\"" + sig + "\"")
    assert(AntelopeAbi.hexToJson(abi, "signature", sigHex) === "\"" + sig + "\"")
  }

  // --------------------------------------------------- property round-trips

  test("property: random transfers round-trip json->hex->json") {
    val accountGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a' to 'z')).map(_.mkString))
    val memoGen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '!', '.'))).map(_.mkString))
    check(Prop.forAll(accountGen, accountGen, Gen.choose(0L, 1000000000L), memoGen) {
      (from, to, units, memo) =>
        val json = s"""{"from":"$from","to":"$to","quantity":"${units / 10000}.${"%04d".format(units % 10000)} EOS","memo":"$memo"}"""
        AntelopeAbi.hexToJson(tokenAbi, "transfer",
          AntelopeAbi.jsonToHex(tokenAbi, "transfer", json)) == json
    })
  }

  test("property: random scalar u64/i64/varint values round-trip") {
    val abi = AntelopeAbi.parseAbi("""{"version":"eosio::abi/1.2"}""")
    check(Prop.forAll { (v: Long) =>
      AntelopeAbi.hexToJson(abi, "int64",
        AntelopeAbi.jsonToHex(abi, "int64", "\"" + v + "\"")) == "\"" + v + "\""
    }, min = 200)
    check(Prop.forAll { (v: Int) =>
      AntelopeAbi.hexToJson(abi, "varint32",
        AntelopeAbi.jsonToHex(abi, "varint32", v.toString)) == v.toString
    }, min = 200)
  }
}
