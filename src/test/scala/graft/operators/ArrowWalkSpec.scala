package graft.operators

import graft.SparkSpec

/** From-spec Arrow IPC reader vs the REAL Arrow Java writer: file
  * round trips across batch splits, validity bitmaps, all supported
  * scalar types via a hand-assembled stream, quarantine on
  * truncation/bad magic/unsupported shapes, Spark fan-out.
  */
class ArrowWalkSpec extends SparkSpec {

  private val recs = (0L until 25L).map { i =>
    (i, s"src${i % 4}", s"document $i body " + ("x" * (i % 7).toInt))
  }

  test("file round trip against the Arrow Java writer, multi-batch") {
    for (batchRows <- Seq(25, 7, 1)) {
      val t = ArrowWalk.table(ArrowWalk.fixture(recs, batchRows)) match {
        case Right(v) => v
        case Left(e) => fail(s"batchRows=$batchRows quarantined: $e")
      }
      assert(t.cols.map(_.name) ===
        Seq("doc_id", "source", "text", "marks", "meta", "props"),
        s"b=$batchRows")
      assert(t.cols.map(_.typ) ===
        Seq("int64", "utf8", "utf8", "list<int64>",
          "struct<rank:int64,tag:utf8>", "map<utf8,int64>"))
      assert(t.nRows === 25, s"b=$batchRows")
      assert((0 until 25).map(i => t.values(0)(i)) === recs.map(r => java.lang.Long.valueOf(r._1)))
      assert((0 until 25).map(i => t.values(2)(i)) === recs.map(_._3))
    }
  }

  test("list<int64> column: offsets + child values decode per cell") {
    for (batchRows <- Seq(25, 7)) {
      val t = ArrowWalk.table(ArrowWalk.fixture(recs, batchRows))
        .getOrElse(fail(s"quarantined at b=$batchRows"))
      val mk = t.cols.map(_.name).indexOf("marks")
      (0 until 25).foreach { i =>
        if (i % 9 == 0) assert(t.values(mk)(i) == null, s"row $i b=$batchRows")
        else assert(t.values(mk)(i) ===
          Vector(i % 7, i % 5, i % 3).map(v => java.lang.Long.valueOf(v.toLong)),
          s"row $i b=$batchRows")
      }
    }
    // compressed bodies run the same list path through the codecs
    for (codec <- Seq("lz4", "zstd")) {
      val t = ArrowWalk.table(ArrowWalk.fixture(recs, 7, compress = codec))
        .getOrElse(fail(s"quarantined at $codec"))
      val mk = t.cols.map(_.name).indexOf("marks")
      assert(t.values(mk)(1) ===
        Vector(1L, 1L, 1L).map(java.lang.Long.valueOf), codec)
      assert(t.values(mk)(9) == null, codec)
    }
  }

  test("struct<rank:int64,tag:utf8> column: validity + member arrays decode per cell") {
    for (batchRows <- Seq(25, 7)) {
      val t = ArrowWalk.table(ArrowWalk.fixture(recs, batchRows))
        .getOrElse(fail(s"quarantined at b=$batchRows"))
      val mt = t.cols.map(_.name).indexOf("meta")
      assert(t.cols(mt).typ === "struct<rank:int64,tag:utf8>")
      (0 until 25).foreach { i =>
        if (i % 13 == 5) assert(t.values(mt)(i) == null, s"row $i b=$batchRows")
        else assert(t.values(mt)(i) ===
          Vector(java.lang.Long.valueOf(i % 11L), s"t${i % 4}"),
          s"row $i b=$batchRows")
      }
    }
    // compressed bodies run the same struct path through the codecs
    for (codec <- Seq("lz4", "zstd")) {
      val t = ArrowWalk.table(ArrowWalk.fixture(recs, 7, compress = codec))
        .getOrElse(fail(s"quarantined at $codec"))
      val mt = t.cols.map(_.name).indexOf("meta")
      assert(t.values(mt)(1) === Vector(java.lang.Long.valueOf(1L), "t1"), codec)
      assert(t.values(mt)(18) == null, codec) // 18 % 13 == 5
    }
  }

  test("map<utf8,int64> column: offsets + entries struct decode per cell") {
    for (batchRows <- Seq(25, 7)) {
      val t = ArrowWalk.table(ArrowWalk.fixture(recs, batchRows))
        .getOrElse(fail(s"quarantined at b=$batchRows"))
      val pr = t.cols.map(_.name).indexOf("props")
      assert(t.cols(pr).typ === "map<utf8,int64>")
      (0 until 25).foreach { i =>
        if (i % 17 == 3) assert(t.values(pr)(i) == null, s"row $i b=$batchRows")
        else {
          val expected =
            if (i % 2 == 0)
              Vector(("a", java.lang.Long.valueOf(i % 6L)),
                ("b", java.lang.Long.valueOf(i % 10L)))
            else Vector(("a", java.lang.Long.valueOf(i % 6L)))
          assert(t.values(pr)(i) === expected, s"row $i b=$batchRows")
        }
      }
    }
    // compressed bodies run the same map path through the codecs
    val t = ArrowWalk.table(ArrowWalk.fixture(recs, 7, compress = "zstd"))
      .getOrElse(fail("quarantined at zstd"))
    val pr = t.cols.map(_.name).indexOf("props")
    assert(t.values(pr)(3) == null) // 3 % 17 == 3
    assert(t.values(pr)(4) ===
      Vector(("a", java.lang.Long.valueOf(4L)), ("b", java.lang.Long.valueOf(4L))))
  }

  test("recursive nesting: list<list<int64>> and struct carrying a list member") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.{ListVector, StructVector}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    def item(t: ArrowType) = new Field("item", FieldType.nullable(t), null)
    val fields = List(
      new Field("ll", FieldType.nullable(new ArrowType.List()),
        List(new Field("item", FieldType.nullable(new ArrowType.List()),
          List(item(new ArrowType.Int(64, true))).asJava)).asJava),
      new Field("sl", FieldType.nullable(new ArrowType.Struct()),
        List(
          new Field("a", FieldType.nullable(new ArrowType.List()),
            List(item(new ArrowType.Int(64, true))).asJava),
          new Field("b", FieldType.nullable(new ArrowType.Utf8()), null)).asJava))
    val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(bos))
    w.start()
    root.allocateNew()
    val ll = root.getVector("ll").asInstanceOf[ListVector]
    val lw = ll.getWriter
    lw.setPosition(0); lw.startList()
    lw.list().startList()
    lw.list().bigInt().writeBigInt(1L); lw.list().bigInt().writeBigInt(2L)
    lw.list().endList()
    lw.list().startList(); lw.list().bigInt().writeBigInt(3L); lw.list().endList()
    lw.endList()
    // row 1 stays null; row 2 = [[]] (one empty inner list)
    lw.setPosition(2); lw.startList()
    lw.list().startList(); lw.list().endList()
    lw.endList()
    val sl = root.getVector("sl").asInstanceOf[StructVector]
    val aw = sl.getChild("a").asInstanceOf[ListVector].getWriter
    val bVec = sl.getChild("b").asInstanceOf[VarCharVector]
    sl.setIndexDefined(0)
    aw.setPosition(0); aw.startList(); aw.bigInt().writeBigInt(7L); aw.endList()
    bVec.setSafe(0, "x".getBytes("UTF-8"))
    sl.setIndexDefined(2)
    aw.setPosition(2); aw.startList(); aw.endList()
    bVec.setSafe(2, "yz".getBytes("UTF-8"))
    root.setRowCount(3)
    w.writeBatch(); w.end(); w.close(); root.close(); alloc.close()
    val t = ArrowWalk.table(bos.toByteArray).getOrElse(fail("quarantined"))
    assert(t.cols.map(_.typ) ===
      Seq("list<list<int64>>", "struct<a:list<int64>,b:utf8>"))
    def L(v: Long) = java.lang.Long.valueOf(v)
    assert(t.values(0)(0) === Vector(Vector(L(1), L(2)), Vector(L(3))))
    assert(t.values(0)(1) === null)
    assert(t.values(0)(2) === Vector(Vector()))
    assert(t.values(1)(0) === Vector(Vector(L(7)), "x"))
    assert(t.values(1)(1) === null)
    assert(t.values(1)(2) === Vector(Vector(), "yz"))
  }

  test("delta dictionary batches append to the registered values") {
    // stream hand-orchestrated through the REAL Arrow Java serializer:
    // schema → dict(7: alpha,beta) → batch[1,0] → DELTA dict(+gamma)
    // → batch[2,0] → EOS. Indices before the delta stay valid; the
    // second batch indexes the extended range.
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
    import org.apache.arrow.vector.util.DictionaryUtility
    import org.apache.arrow.vector.ipc.WriteChannel
    import org.apache.arrow.vector.ipc.message.{ArrowDictionaryBatch, MessageSerializer}
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val enc = new DictionaryEncoding(7L, false, new ArrowType.Int(32, true))
    def dictBatchBytes(values: Seq[String]): VarCharVector = {
      val v = new VarCharVector("dictv", alloc)
      v.allocateNew()
      values.zipWithIndex.foreach { case (s, i) => v.setSafe(i, s.getBytes("UTF-8")) }
      v.setValueCount(values.size)
      v
    }
    val dictVec = dictBatchBytes(Seq("alpha", "beta"))
    val provider = new DictionaryProvider.MapDictionaryProvider(
      new Dictionary(dictVec, enc))
    val indexField = new Field("code",
      new FieldType(true, new ArrowType.Int(32, true), enc), null)
    val bos = new java.io.ByteArrayOutputStream()
    val ch = new WriteChannel(java.nio.channels.Channels.newChannel(bos))
    // schema message: index field converted to its VALUE-typed form
    val msgField = DictionaryUtility.toMessageFormat(
      indexField, provider, new java.util.HashSet[java.lang.Long]())
    MessageSerializer.serialize(ch, new ASchema(List(msgField).asJava))
    def writeDict(values: Seq[String], isDelta: Boolean): Unit = {
      val v = dictBatchBytes(values)
      val root = new VectorSchemaRoot(
        List(v.getField).asJava, List[FieldVector](v).asJava, values.size)
      val rb = new VectorUnloader(root).getRecordBatch
      try MessageSerializer.serialize(ch, new ArrowDictionaryBatch(7L, rb, isDelta))
      finally { rb.close(); root.close() }
    }
    def writeBatch(indices: Seq[Integer]): Unit = {
      val iv = new IntVector(indexField, alloc)
      iv.allocateNew(indices.size)
      indices.zipWithIndex.foreach { case (x, i) =>
        if (x == null) iv.setNull(i) else iv.setSafe(i, x.intValue())
      }
      iv.setValueCount(indices.size)
      val root = new VectorSchemaRoot(
        List(msgField).asJava, List[FieldVector](iv).asJava, indices.size)
      val rb = new VectorUnloader(root).getRecordBatch
      try MessageSerializer.serialize(ch, rb)
      finally { rb.close(); root.close() }
    }
    writeDict(Seq("alpha", "beta"), isDelta = false)
    writeBatch(Seq(1, 0))
    writeDict(Seq("gamma"), isDelta = true) // APPEND, not replace
    writeBatch(Seq(2, 0))
    ch.writeIntLittleEndian(MessageSerializer.IPC_CONTINUATION_TOKEN)
    ch.writeIntLittleEndian(0) // end-of-stream
    dictVec.close(); alloc.close()
    val t = ArrowWalk.table(bos.toByteArray).getOrElse(fail("quarantined"))
    assert(t.cols.head.typ === "utf8")
    assert((0 until 4).map(i => t.values(0)(i)) ===
      Seq("beta", "alpha", "gamma", "alpha"))
    // a delta for an id never registered must quarantine, not decode
    val bos2 = new java.io.ByteArrayOutputStream()
    val ch2 = new WriteChannel(java.nio.channels.Channels.newChannel(bos2))
    val alloc2 = new RootAllocator()
    MessageSerializer.serialize(ch2, new ASchema(List(msgField).asJava))
    locally {
      val v = new VarCharVector("dictv", alloc2)
      v.allocateNew(); v.setSafe(0, "zeta".getBytes("UTF-8")); v.setValueCount(1)
      val root = new VectorSchemaRoot(
        List(v.getField).asJava, List[FieldVector](v).asJava, 1)
      val rb = new VectorUnloader(root).getRecordBatch
      try MessageSerializer.serialize(ch2, new ArrowDictionaryBatch(7L, rb, true))
      finally { rb.close(); root.close(); alloc2.close() }
    }
    ch2.writeIntLittleEndian(MessageSerializer.IPC_CONTINUATION_TOKEN)
    ch2.writeIntLittleEndian(0)
    assert(ArrowWalk.table(bos2.toByteArray).isLeft)
  }

  test("compressed bodies: LZ4_FRAME and ZSTD buffer compression round trip") {
    for (codec <- Seq("lz4", "zstd"); batchRows <- Seq(25, 7)) {
      val bytes = ArrowWalk.fixture(recs, batchRows, nullSourceEvery = 5,
        compress = codec)
      // witness the writer actually compressed (BodyCompression present)
      assert(!bytes.sameElements(
        ArrowWalk.fixture(recs, batchRows, nullSourceEvery = 5)),
        s"$codec fixture identical to uncompressed")
      val t = ArrowWalk.table(bytes) match {
        case Right(v) => v
        case Left(e) => fail(s"$codec b=$batchRows quarantined: $e")
      }
      assert(t.nRows === 25, s"$codec b=$batchRows")
      assert((0 until 25).map(i => t.values(0)(i)) ===
        recs.map(r => java.lang.Long.valueOf(r._1)))
      assert((0 until 25).map(i => t.values(2)(i)) === recs.map(_._3))
      // null pattern survives decompression
      (0 until 25).foreach { i =>
        if (i % 5 == 0) assert(t.values(1)(i) === null, s"$codec row $i")
        else assert(t.values(1)(i) === recs(i)._2, s"$codec row $i")
      }
    }
  }

  test("compressed bodies: a batch with more values than 8x its FILE bytes decodes") {
    // highly compressible content (identical short rows) makes the
    // on-disk file far smaller than its uncompressed body — the r16
    // forged-node floor (rows <= file_bytes * 8) falsely quarantined
    // this legitimate shape; the floor must come from the DECLARED
    // uncompressed buffer lengths when a codec is present
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VectorSchemaRoot}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import scala.jdk.CollectionConverters._
    val n = 200000
    val alloc = new RootAllocator()
    val bytes =
      try {
        val fields = List(new Field("v",
          FieldType.nullable(new ArrowType.Int(64, true)), null))
        val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
        val bos = new java.io.ByteArrayOutputStream()
        val ch = java.nio.channels.Channels.newChannel(bos)
        val w = new ArrowFileWriter(root, null, ch,
          new java.util.HashMap[String, String](),
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE,
          org.apache.arrow.vector.compression.CompressionUtil.CodecType.ZSTD)
        w.start()
        root.allocateNew()
        val v = root.getVector("v").asInstanceOf[BigIntVector]
        (0 until n).foreach(i => v.setSafe(i, 7L))
        root.setRowCount(n)
        w.writeBatch()
        w.end(); w.close(); root.close()
        bos.toByteArray
      } finally alloc.close()
    assert(n.toLong > bytes.length.toLong * 8,
      s"fixture not compressible enough to exercise the floor (${bytes.length} B)")
    val t = ArrowWalk.table(bytes) match {
      case Right(v) => v
      case Left(e) => fail(s"falsely quarantined: $e")
    }
    assert(t.nRows === n)
    assert(t.values(0)(n - 1) === java.lang.Long.valueOf(7L))
  }

  test("forged declared-length prefix cannot inflate the node floor") {
    // r17 ADVICE (high): the capacity floor trusted ATTACKER-CONTROLLED
    // declared uncompressed lengths (clamped only at 16 GiB/buffer), so a
    // tiny forged file could authorize near-Int.MaxValue node lengths —
    // a giant boxed allocation before any decode check fires. The floor
    // is now clamped to 4096x the file's ACTUAL bytes; forge both the
    // declared prefix (1 TiB) and the field-node length and the file must
    // quarantine at the range guard, never allocate.
    val bytes = ArrowWalk.fixture(recs, 25, compress = "zstd")
    // the 8 bytes before the first zstd frame magic are that buffer's
    // declared uncompressed length — forge it to 1 TiB
    val at = bytes.indices.find(i => i + 4 <= bytes.length &&
      (bytes(i) & 0xff) == 0x28 && (bytes(i + 1) & 0xff) == 0xb5 &&
      (bytes(i + 2) & 0xff) == 0x2f && (bytes(i + 3) & 0xff) == 0xfd)
    assert(at.isDefined && at.get >= 8, "no zstd frame in compressed fixture")
    val huge = 1L << 40
    (0 until 8).foreach(k =>
      bytes(at.get - 8 + k) = ((huge >> (8 * k)) & 0xff).toByte)
    // forge every field-node length (25 rows, LE i64) to a value far above
    // the file-relative floor but still Int-representable, so this is a
    // witness of the ratio clamp specifically (not the toInt guard)
    val forgedLen = math.max(bytes.length.toLong * 4096 * 8 * 2, 100000000L)
    assert(forgedLen <= Int.MaxValue,
      s"fixture unexpectedly large (${bytes.length} B) for a clean witness")
    val pat = (0 until 8).map(k => ((25L >> (8 * k)) & 0xff).toByte)
    var i = 0
    var patched = 0
    while (i <= bytes.length - 8) {
      if ((0 until 8).forall(k => bytes(i + k) == pat(k))) {
        (0 until 8).foreach(k =>
          bytes(i + k) = ((forgedLen >> (8 * k)) & 0xff).toByte)
        patched += 1
        i += 8
      } else i += 1
    }
    assert(patched >= 1, "no LE i64 row-count pattern found to forge")
    assert(ArrowWalk.table(bytes).isLeft,
      "forged node length must quarantine, not decode or allocate")
  }

  test("compressed bodies: corrupted frame magic quarantines the file") {
    val bytes = ArrowWalk.fixture(recs, 25, compress = "zstd")
    // locate the first zstd frame magic (28 B5 2F FD LE) in the body
    // and break it — the buffer decompression must fail loudly
    val at = bytes.indices.find(i => i + 4 <= bytes.length &&
      (bytes(i) & 0xff) == 0x28 && (bytes(i + 1) & 0xff) == 0xb5 &&
      (bytes(i + 2) & 0xff) == 0x2f && (bytes(i + 3) & 0xff) == 0xfd)
    assert(at.isDefined, "no zstd frame found in compressed fixture")
    bytes(at.get) = (bytes(at.get) ^ 0xff).toByte
    assert(ArrowWalk.table(bytes).isLeft)
  }

  test("validity bitmaps: nulled source cells decode as null, others intact") {
    val t = ArrowWalk.table(ArrowWalk.fixture(recs, 7, nullSourceEvery = 5))
      .getOrElse(fail("quarantined"))
    (0 until 25).foreach { i =>
      if (i % 5 == 0) assert(t.values(1)(i) == null, s"row $i")
      else assert(t.values(1)(i) === s"src${i % 4}", s"row $i")
    }
    // the non-null columns are unaffected
    assert(t.values(0)(24) === java.lang.Long.valueOf(24L))
  }

  test("quarantine: truncation, bad magic, garbage") {
    val good = ArrowWalk.fixture(recs, 7)
    assert(ArrowWalk.table(java.util.Arrays.copyOf(good, good.length - 5)).isLeft)
    val badMagic = good.clone(); badMagic(good.length - 1) = 'X'.toByte
    assert(ArrowWalk.table(badMagic).isLeft)
    assert(ArrowWalk.table("not arrow at all, just some text".getBytes).isLeft)
    assert(ArrowWalk.table(Array.emptyByteArray).isLeft)
  }

  test("flipped footer-length field quarantines the file") {
    val good = ArrowWalk.fixture(recs, 7)
    val bad = good.clone()
    bad(good.length - 10) = (bad(good.length - 10) ^ 0x40).toByte
    assert(ArrowWalk.table(bad).isLeft)
  }

  test("all scalar widths + bool + float via the Arrow Java writer") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val fields = List(
      new Field("i8", FieldType.nullable(new ArrowType.Int(8, true)), null),
      new Field("i16", FieldType.nullable(new ArrowType.Int(16, true)), null),
      new Field("i32", FieldType.nullable(new ArrowType.Int(32, true)), null),
      new Field("f32", FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)), null),
      new Field("f64", FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null),
      new Field("flag", FieldType.nullable(new ArrowType.Bool()), null))
    val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(bos))
    w.start()
    root.allocateNew()
    root.getVector("i8").asInstanceOf[TinyIntVector].setSafe(0, -5)
    root.getVector("i16").asInstanceOf[SmallIntVector].setSafe(0, -300)
    root.getVector("i32").asInstanceOf[IntVector].setSafe(0, 70000)
    root.getVector("f32").asInstanceOf[Float4Vector].setSafe(0, 1.5f)
    root.getVector("f64").asInstanceOf[Float8Vector].setSafe(0, -2.25d)
    root.getVector("flag").asInstanceOf[BitVector].setSafe(0, 1)
    root.getVector("i8").asInstanceOf[TinyIntVector].setSafe(1, 7)
    root.getVector("i16").asInstanceOf[SmallIntVector].setSafe(1, 7)
    root.getVector("i32").asInstanceOf[IntVector].setSafe(1, 7)
    root.getVector("f32").asInstanceOf[Float4Vector].setSafe(1, 0.25f)
    root.getVector("f64").asInstanceOf[Float8Vector].setSafe(1, 0.5d)
    root.getVector("flag").asInstanceOf[BitVector].setSafe(1, 0)
    root.setRowCount(2)
    w.writeBatch(); w.end(); w.close(); root.close(); alloc.close()
    val t = ArrowWalk.table(bos.toByteArray).getOrElse(fail("quarantined"))
    assert(t.cols.map(_.typ) === Seq("int8", "int16", "int32", "float32", "float64", "bool"))
    assert(t.values(0)(0) === java.lang.Long.valueOf(-5L)) // sign extension
    assert(t.values(1)(0) === java.lang.Long.valueOf(-300L))
    assert(t.values(2)(0) === java.lang.Long.valueOf(70000L))
    assert(t.values(3)(0) === java.lang.Double.valueOf(1.5d))
    assert(t.values(4)(0) === java.lang.Double.valueOf(-2.25d))
    assert(t.values(5)(0) === java.lang.Boolean.TRUE)
    assert(t.values(5)(1) === java.lang.Boolean.FALSE)
  }

  test("dictionary-encoded columns decode through the DictionaryBatch") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val dictVec = new VarCharVector("dictv", alloc)
    dictVec.allocateNew()
    dictVec.setSafe(0, "alpha".getBytes); dictVec.setSafe(1, "beta".getBytes)
    dictVec.setSafe(2, "gamma".getBytes); dictVec.setValueCount(3)
    val enc = new DictionaryEncoding(7L, false, new ArrowType.Int(32, true))
    val dict = new Dictionary(dictVec, enc)
    val provider = new DictionaryProvider.MapDictionaryProvider(dict)
    // Arrow Java's IN-MEMORY field carries the INDEX type; the IPC
    // writer emits the VALUE type (utf8) into the schema message
    val f = new Field("code",
      new FieldType(true, new ArrowType.Int(32, true), enc), null)
    val root = VectorSchemaRoot.create(new ASchema(List(f).asJava), alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, provider, java.nio.channels.Channels.newChannel(bos))
    w.start()
    root.allocateNew()
    val codes = root.getVector("code").asInstanceOf[IntVector]
    codes.setSafe(0, 2); codes.setSafe(1, 0); codes.setNull(2); codes.setSafe(3, 1)
    root.setRowCount(4)
    w.writeBatch(); w.end(); w.close(); root.close(); dictVec.close(); alloc.close()
    val t = ArrowWalk.table(bos.toByteArray).getOrElse(fail("quarantined"))
    assert(t.cols.head.typ === "utf8")
    assert((0 until 4).map(i => t.values(0)(i)) ===
      Seq("gamma", "alpha", null, "beta"))
  }

  test("date32/date64/timestamp columns decode as raw wire integers") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.{DateUnit, TimeUnit}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val fields = List(
      new Field("d32", FieldType.nullable(new ArrowType.Date(DateUnit.DAY)), null),
      new Field("d64", FieldType.nullable(new ArrowType.Date(DateUnit.MILLISECOND)), null),
      new Field("ts", FieldType.nullable(
        new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")), null))
    val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(bos))
    w.start()
    root.allocateNew()
    val d32 = root.getVector("d32").asInstanceOf[DateDayVector]
    val d64 = root.getVector("d64").asInstanceOf[DateMilliVector]
    val ts = root.getVector("ts").asInstanceOf[TimeStampMicroTZVector]
    d32.setSafe(0, 19000); d32.setSafe(1, -3)
    d64.setSafe(0, 1700000000000L); d64.setNull(1)
    ts.setSafe(0, 1700000000000000L); ts.setSafe(1, 42L)
    root.setRowCount(2)
    w.writeBatch(); w.end(); w.close(); root.close(); alloc.close()
    val t = ArrowWalk.table(bos.toByteArray).getOrElse(fail("quarantined"))
    assert(t.cols.map(_.typ) === Seq("date32", "date64", "timestamp_us"))
    assert(t.values(0)(0) === java.lang.Long.valueOf(19000L))
    assert(t.values(0)(1) === java.lang.Long.valueOf(-3L)) // sign extension
    assert(t.values(1)(0) === java.lang.Long.valueOf(1700000000000L))
    assert(t.values(1)(1) === null)
    assert(t.values(2)(0) === java.lang.Long.valueOf(1700000000000000L))
    assert(t.values(2)(1) === java.lang.Long.valueOf(42L))
  }

  test("decimal128/time32/time64/duration columns decode exactly") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.TimeUnit
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val fields = List(
      new Field("dec", FieldType.nullable(new ArrowType.Decimal(20, 4, 128)), null),
      new Field("t32", FieldType.nullable(new ArrowType.Time(TimeUnit.MILLISECOND, 32)), null),
      new Field("t64", FieldType.nullable(new ArrowType.Time(TimeUnit.MICROSECOND, 64)), null),
      new Field("dur", FieldType.nullable(new ArrowType.Duration(TimeUnit.MILLISECOND)), null))
    val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(bos))
    w.start()
    root.allocateNew()
    val dec = root.getVector("dec").asInstanceOf[DecimalVector]
    dec.setSafe(0, new java.math.BigDecimal("1234567890123456.7890"))
    dec.setSafe(1, new java.math.BigDecimal("-0.0001"))
    dec.setNull(2)
    val t32 = root.getVector("t32").asInstanceOf[TimeMilliVector]
    t32.setSafe(0, 86399999); t32.setSafe(1, 0); t32.setSafe(2, 1)
    val t64 = root.getVector("t64").asInstanceOf[TimeMicroVector]
    t64.setSafe(0, 86399999999999L); t64.setSafe(1, 7L); t64.setSafe(2, 8L)
    val dur = root.getVector("dur").asInstanceOf[DurationVector]
    dur.setSafe(0, -5000L); dur.setSafe(1, 0L); dur.setSafe(2, 123L)
    root.setRowCount(3)
    w.writeBatch(); w.end(); w.close(); root.close(); alloc.close()
    val t = ArrowWalk.table(bos.toByteArray).getOrElse(fail("quarantined"))
    assert(t.cols.map(_.typ) ===
      Seq("decimal(20,4)", "time32_ms", "time64_us", "duration_ms"))
    assert(t.values(0)(0) === new java.math.BigDecimal("1234567890123456.7890"))
    assert(t.values(0)(1) === new java.math.BigDecimal("-0.0001"))
    assert(t.values(0)(2) === null)
    assert(t.values(1)(0) === java.lang.Long.valueOf(86399999L))
    assert(t.values(2)(0) === java.lang.Long.valueOf(86399999999999L))
    assert(t.values(3)(0) === java.lang.Long.valueOf(-5000L))
    assert(t.values(3)(2) === java.lang.Long.valueOf(123L))
  }

  test("STREAM encapsulation (no footer) walks sequentially to EOS") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val fields = List(
      new Field("doc_id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("text", FieldType.nullable(new ArrowType.Utf8()), null))
    val root = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowStreamWriter(root, null, java.nio.channels.Channels.newChannel(bos))
    w.start()
    (0 until 3).foreach { b =>
      root.allocateNew()
      val ids = root.getVector("doc_id").asInstanceOf[BigIntVector]
      val txts = root.getVector("text").asInstanceOf[VarCharVector]
      (0 until 4).foreach { i =>
        ids.setSafe(i, b * 10L + i)
        txts.setSafe(i, s"stream batch $b row $i".getBytes("UTF-8"))
      }
      root.setRowCount(4)
      w.writeBatch()
    }
    w.end(); w.close(); root.close(); alloc.close()
    val t = ArrowWalk.table(bos.toByteArray).getOrElse(fail("quarantined"))
    assert(t.nRows === 12)
    assert(t.values(0)(11) === java.lang.Long.valueOf(23L))
    assert(t.values(1)(0) === "stream batch 0 row 0")
  }

  test("fuzz: 300 hostile payloads quarantine or decode, never throw") {
    // the contract is table()'s Either — pure random bytes, bit-flipped
    // and truncated valid files (plain and compressed, with the nested
    // struct/map/list columns in play) must come back Left or Right,
    // never an escaping exception, hang, or giant allocation
    val rnd = new scala.util.Random(0xa44c)
    val valid = Seq(
      ArrowWalk.fixture(recs, 7),
      ArrowWalk.fixture(recs, 25, nullSourceEvery = 5, compress = "zstd"))
    def mutate(b: Array[Byte]): Array[Byte] = {
      val o = b.clone()
      for (_ <- 0 until 1 + rnd.nextInt(8)) {
        val i = rnd.nextInt(o.length)
        o(i) = (o(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      o
    }
    var decoded = 0; var quarantined = 0
    (0 until 300).foreach { i =>
      val base = valid(i % valid.length)
      val payload = i % 4 match {
        case 0 => Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte)
        case 1 => mutate(base)
        case 2 => base.take(rnd.nextInt(base.length))
        case _ => mutate(mutate(base))
      }
      ArrowWalk.table(payload) match {
        case Right(t) => decoded += 1; assert(t.nRows >= 0)
        case Left(msg) => quarantined += 1; assert(msg != null)
      }
    }
    assert(decoded + quarantined === 300)
    assert(quarantined > 0) // the hostile set actually exercised rejects
  }

  test("Spark fan-out: parseDocs walks files partition-parallel") {
    import spark.implicits._
    val files = (0L until 5L).map { c =>
      (c, ArrowWalk.fixture(
        (0L until 8L).map(i => (c * 100 + i, s"s$c", s"chunk $c doc $i")), 3))
    } :+ (9L, "broken".getBytes("UTF-8"))
    val df = files.toDF("chunk", "payload").repartition(3)
    val out = ArrowWalk.parseDocs(df)(spark).collect()
    assert(out.count(_.corrupt) === 1)
    assert(out.filter(_.corrupt).head.chunk === 9L)
    assert(out.count(!_.corrupt) === 40)
    assert(out.filter(r => !r.corrupt && r.chunk == 2L).map(_.doc_id.toLong).sorted.toSeq
      === (200L until 208L))
  }
}
