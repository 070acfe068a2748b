package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** The from-spec Avro OCF walk against the REAL library (avro-1.12.1,
  * on the Spark classpath): every primitive of the flat-record subset,
  * both null-union orders, all four codecs, multi-block files with
  * sync-marker resync, and honest out-of-subset reporting.
  */
class AvroWalkSpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"Doc","fields":[
       {"name":"id","type":"long"},
       {"name":"name","type":["null","string"]},
       {"name":"alt","type":["string","null"]},
       {"name":"score","type":"double"},
       {"name":"ratio","type":"float"},
       {"name":"flag","type":"boolean"},
       {"name":"small","type":"int"},
       {"name":"blob","type":"bytes"}]}"""

  private def write(n: Int, codec: CodecFactory, syncInterval: Int = 1 << 20): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec)
    w.setSyncInterval(syncInterval)
    w.create(schema, out)
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong * 1000003L)
      r.put("name", if (i % 3 == 0) null else s"name-$i")
      r.put("alt", if (i % 4 == 1) null else s"alt/$i")
      r.put("score", i * 0.5 - 7.25)
      r.put("ratio", i * 0.25f)
      r.put("flag", i % 2 == 0)
      r.put("small", i - 50)
      r.put("blob", java.nio.ByteBuffer.wrap(Array[Byte](i.toByte, (i * 7).toByte)))
      w.append(r)
    }
    w.close()
    out.toByteArray
  }

  private val codecs = Seq(
    "null" -> CodecFactory.nullCodec(),
    "deflate" -> CodecFactory.deflateCodec(6),
    "snappy" -> CodecFactory.snappyCodec(),
    "zstandard" -> CodecFactory.zstandardCodec(3))

  test("round-trips real DataFileWriter output in all four codecs") {
    for ((name, cf) <- codecs) {
      val bytes = write(40, cf)
      val info = AvroWalk.walk(bytes).getOrElse(fail(s"$name must walk"))
      assert(info.codec === name)
      assert(info.fields.isDefined, "flat schema must be in subset")
      assert(info.records.length === 40)
      assert(info.records.forall(!_.corrupt))
      val r7 = info.records(7).values
      assert(r7(0) === (7L * 1000003L).toString)
      assert(r7(1) === "name-7")
      assert(r7(2) === "alt/7")
      assert(r7(3) === (7 * 0.5 - 7.25).toString)
      assert(r7(4) === (7 * 0.25f).toString)
      assert(r7(5) === "false")
      assert(r7(6) === (7 - 50).toString)
      assert(r7(7) === java.util.Base64.getEncoder.encodeToString(Array[Byte](7, 49)))
      // both union orders: null at the right branches
      val r0 = info.records(0).values
      assert(r0(1) == null, "['null',T] null branch")
      val r5 = info.records(5).values
      assert(r5(2) == null, "[T,'null'] null branch")
    }
  }

  test("multi-block files resynchronize at the sync marker after corruption") {
    // tiny sync interval forces many blocks
    val bytes = write(300, CodecFactory.nullCodec(), syncInterval = 1024)
    val clean = AvroWalk.walk(bytes).get
    assert(clean.records.length === 300)
    val blocks = clean.records.map(_.blockOffset).distinct
    assert(blocks.length > 3, s"need several blocks, got ${blocks.length}")
    // corrupt the SECOND block's first byte: its span quarantines, the
    // walk resumes at the next sync marker
    val bad = bytes.clone()
    bad(blocks(1).toInt) = (bad(blocks(1).toInt) ^ 0x7f).toByte
    val walked = AvroWalk.walk(bad).get
    val corrupt = walked.records.filter(_.corrupt)
    assert(corrupt.length >= 1)
    val okRecs = walked.records.filter(!_.corrupt)
    // all block-1 records and all blocks after the resync point survive
    val cleanByBlock = clean.records.groupBy(_.blockOffset)
    assert(okRecs.length >= 300 - 2 * cleanByBlock(blocks(1)).length - 1)
    assert(okRecs.map(_.values(0)).toSet.subsetOf(clean.records.map(_.values(0)).toSet))
  }

  test("truncation quarantines the tail; garbage is not Avro; nested schemas report out-of-subset") {
    val bytes = write(20, CodecFactory.deflateCodec(4))
    val cut = AvroWalk.walk(bytes.take(bytes.length - 10)).get
    assert(cut.records.exists(_.corrupt))
    assert(AvroWalk.walk("not avro at all".getBytes("UTF-8")).isEmpty)
    // nested schema: walk succeeds structurally, fields=None, no silent rows
    val nested = new Schema.Parser().parse(
      """{"type":"record","name":"N","fields":[
         {"name":"inner","type":{"type":"record","name":"I",
          "fields":[{"name":"x","type":"long"}]}}]}""")
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](nested))
    w.create(nested, out)
    val inner = new GenericData.Record(nested.getField("inner").schema())
    inner.put("x", 1L)
    val rec = new GenericData.Record(nested)
    rec.put("inner", inner)
    w.append(rec); w.close()
    val info = AvroWalk.walk(out.toByteArray).get
    assert(info.fields.isEmpty, "nested schema is out of subset")
    assert(info.records.forall(!_.corrupt), "out-of-subset is NOT corruption")
  }

  test("the embedded-schema JSON parser handles escapes and structure") {
    import AvroWalk.Json
    val v = Json.parse("""{"a":[1,2.5,-3e2],"b":"x\nyA","c":{"d":true,"e":null}}""")
    val Json.O(m) = v: @unchecked
    val Json.A(items) = m("a"): @unchecked
    assert(items === List(Json.N(1), Json.N(2.5), Json.N(-300)))
    assert(m("b") === Json.S("x\nyA"))
    val Json.O(c) = m("c"): @unchecked
    assert(c("d") === Json.B(true) && c("e") === Json.Null)
  }
}
