package graft.exprs

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/** Malformed SQL-registration calls must surface as user-facing argument
  * errors (USER_RAISED_EXCEPTION), never as INTERNAL_ERROR (which renders
  * as an engine-bug banner).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("wrong arity raises a user error class") {
    val e = intercept[AnalysisException] {
      GraftExtensions.expectArity("shingles(text, n)", Seq(Literal(1)), 2)
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
    assert(e.getMessage.contains("expected 2 arguments, got 1"))
  }

  test("non-literal argument raises a user error class") {
    val e = intercept[AnalysisException] {
      GraftExtensions.intLit(
        org.apache.spark.sql.catalyst.expressions.Add(Literal(1), Literal(2)),
        "minhash_sig(tokens, numHashes)", "numHashes")
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
    assert(e.getMessage.contains("numHashes must be an integer literal"))
  }

  test("valid integer literals of any integral width are accepted") {
    assert(GraftExtensions.intLit(Literal(7), "f", "n") === 7)
    assert(GraftExtensions.intLit(Literal(7L), "f", "n") === 7)
    val e = intercept[AnalysisException] {
      GraftExtensions.intLit(Literal.create(null, IntegerType), "f", "n")
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
  }

  test("constructor require() failures surface as user errors, not raw IAE") {
    val spark = graft.TestSession.spark
    GraftExtensions.registerAll(spark)
    val e = intercept[AnalysisException] {
      spark.sql("SELECT shingles('a b', -1)").collect()
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
    assert(e.getMessage.contains("shingle size must be positive"))
  }

  test("null array elements yield null cosine, not a silent 0.0 read") {
    val spark = graft.TestSession.spark
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_sim(cast(array(1.0, NULL) AS array<double>),
                           cast(array(1.0, 1.0) AS array<double>))""").collect()
    assert(r.head.isNullAt(0), "partial vector must have no cosine")
  }

  test("registerAll: SQL calls equal the Column API on a live session") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val df = Seq("a a b c", "x y", "").toDF("t")
    df.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT token_count(t) AS tc, quality_score(t) AS q,
         repetition_score(t, 2) AS r, exact_key(t) AS k,
         doc_fingerprint(t) AS fp, shingles(t, 2) AS sh,
         cosine_sim(cast(array(1.0, 0.0) AS array<double>),
                    cast(array(1.0, 0.0) AS array<double>)) AS cs
         FROM ext_docs""").collect()
    val api = df.select(
      graft.functions.Text.tokenCount($"t").as("tc"),
      graft.functions.Text.qualityScore($"t").as("q"),
      graft.functions.Text.repetitionScore($"t", 2).as("r"),
      graft.functions.Text.exactKey($"t").as("k"),
      graft.functions.Text.fingerprint($"t").as("fp"),
      Shingles($"t", 2).as("sh"),
      CosineSim(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(1.0),
          org.apache.spark.sql.functions.lit(0.0)),
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(1.0),
          org.apache.spark.sql.functions.lit(0.0))).as("cs")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
    spark.catalog.dropTempView("ext_docs")
  }

  test("fix_mojibake and nfc_normalize from SQL equal the Column API") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    def moj(s: String) = new String(s.getBytes("UTF-8"), "ISO-8859-1")
    // explicit escapes throughout: composed \u00e9 vs decomposed e+\u0301
    // must not depend on this source file's own normalization
    val df = Seq(moj("caf\u00e9 \u211696"), "plain", "e\u0301cole").toDF("t")
    df.createOrReplaceTempView("enc_docs")
    val sql = spark.sql(
      "SELECT fix_mojibake(t) AS f, nfc_normalize(t) AS n FROM enc_docs").collect()
    val api = df.select(FixMojibake($"t").as("f"), NfcNormalize($"t").as("n")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
    assert(sql(0).getString(0) === "caf\u00e9 \u211696")
    assert(sql(2).getString(1) === "\u00e9cole")
    spark.catalog.dropTempView("enc_docs")
  }

  test("table function: compressed_members walks a mixed corpus from pure SQL") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    def gz(s: String): Array[Byte] = {
      val mem = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(mem)
      g.write(s.getBytes("UTF-8")); g.close()
      mem.toByteArray
    }
    def zst(s: String): Array[Byte] = {
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      try { ctx.setLevel(3); ctx.setChecksum(true); ctx.compress(s.getBytes("UTF-8")) }
      finally ctx.close()
    }
    Seq((1L, gz("via gzip") ++ zst("via zstd")), (2L, zst("solo")))
      .toDF("id", "payload").createOrReplaceTempView("cm_blobs")
    val rows = spark.sql(
      """SELECT doc_id, format, body_text
         FROM compressed_members('cm_blobs', 'id', 'payload')
         ORDER BY doc_id, offset""").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "gzip", "via gzip"), (1L, "zstd", "via zstd"), (2L, "zstd", "solo")))
    spark.catalog.dropTempView("cm_blobs")
  }

  test("cdc_cuts from SQL equals the Column API and the HOF formulation") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val df = Seq("abcdefgh" * 40, "tiny", "").toDF("t")
    df.createOrReplaceTempView("cdc_docs")
    val sql = spark.sql("SELECT cdc_cuts(t, 8, 4) AS c FROM cdc_docs")
      .as[Seq[Int]].collect().toSeq
    val api = df.select(CdcCuts($"t", 8, 4).as("c"))
      .as[Seq[Int]].collect().toSeq
    assert(sql === api)
    // and the fused kernel equals the gram_keys HOF it replaced
    val hof = df.select(
      org.apache.spark.sql.functions.filter(
        org.apache.spark.sql.functions.transform(GramKeys($"t", 8),
          (h, j) => org.apache.spark.sql.functions.when(
            h % 16 === 0, j + org.apache.spark.sql.functions.lit(8))
            .otherwise(org.apache.spark.sql.functions.lit(-1))),
        c => c >= 0 && c < org.apache.spark.sql.functions.length($"t"))
        .as("c"))
      .as[Seq[Int]].collect().toSeq
    assert(api === hof)
    spark.catalog.dropTempView("cdc_docs")
  }

  test("table functions: dedup_spans and pack_sequences from pure SQL") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    Seq(
      (1L, "en", "alpha beta gamma delta alpha beta gamma delta tail one"),
      (2L, "en", "alpha beta gamma delta alpha beta gamma delta tail two"),
      (3L, "de", "eins zwei drei vier"))
      .toDF("doc_id", "lang", "text").createOrReplaceTempView("tf_docs")

    val sqlSpans = spark.sql(
      "SELECT * FROM dedup_spans('tf_docs', 'doc_id', 'text', 4, 'lang')")
    val apiSpans = graft.operators.Dedup.dedupSpans(
      spark.table("tf_docs"), "doc_id", "text", 4, Seq("lang"))
    assert(sqlSpans.columns.toSeq === apiSpans.columns.toSeq)
    assert(sqlSpans.exceptAll(apiSpans).count() === 0)
    assert(apiSpans.exceptAll(sqlSpans).count() === 0)

    val sqlPacks = spark.sql(
      """SELECT * FROM pack_sequences('tf_docs', 'doc_id',
         'token_count(text)', 8, 'lang')""")
    val apiPacks = graft.operators.Pack.packSequences(
      spark.table("tf_docs"), "doc_id",
      graft.functions.Text.tokenCount($"text"), 8L, Seq("lang"))
    assert(sqlPacks.exceptAll(apiPacks).count() === 0)
    assert(apiPacks.exceptAll(sqlPacks).count() === 0)

    // the whole flow composes in ONE SQL statement: dedup then pack
    spark.sql("SELECT id AS doc_id, lang, text_dedup AS text " +
        "FROM dedup_spans('tf_docs', 'doc_id', 'text', 4, 'lang')")
      .createOrReplaceTempView("tf_deduped")
    val composed = spark.sql(
      """SELECT * FROM pack_sequences('tf_deduped', 'doc_id',
         'token_count(text)', 8, 'lang')""")
    assert(composed.count() === 3)
    spark.catalog.dropTempView("tf_deduped")
    spark.catalog.dropTempView("tf_docs")
  }

  test("table function: chunk_docs from pure SQL equals the Scala API") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    Seq(
      (1L, (1 to 10).map("w" + _).mkString(" ")),
      (2L, "short doc"),
      (3L, ""))
      .toDF("doc_id", "text").createOrReplaceTempView("tf_chunk_docs")
    val sqlChunks = spark.sql(
      "SELECT * FROM chunk_docs('tf_chunk_docs', 'doc_id', 'text', 8, 4)")
    val apiChunks = graft.operators.Chunk.chunkDocs(
      spark.table("tf_chunk_docs"), "doc_id", "text", 8, 4)
    assert(sqlChunks.columns.toSeq === apiChunks.columns.toSeq)
    assert(sqlChunks.exceptAll(apiChunks).count() === 0)
    assert(apiChunks.exceptAll(sqlChunks).count() === 0)
    val e = intercept[AnalysisException] {
      spark.sql("SELECT * FROM chunk_docs('tf_chunk_docs', 'doc_id', 'text', 8, 9)")
        .collect()
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
    assert(e.getMessage.contains("stride"))
    spark.catalog.dropTempView("tf_chunk_docs")
  }

  test("table functions: cap_per_group and corpus_diff from pure SQL") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    (1L to 60L).map(i => (i, if (i % 3 == 0) "a" else "b", s"doc $i text"))
      .toDF("doc_id", "src", "text").createOrReplaceTempView("tf_cap_docs")
    val sqlCap = spark.sql(
      "SELECT * FROM cap_per_group('tf_cap_docs', 'src', 'doc_id', 10)")
    val apiCap = graft.operators.Selection.capPerGroup(
      spark.table("tf_cap_docs"), "src", "doc_id", 10)
    assert(sqlCap.exceptAll(apiCap).count() === 0)
    assert(apiCap.exceptAll(sqlCap).count() === 0)
    assert(sqlCap.count() === 20)

    spark.sql("SELECT * FROM tf_cap_docs WHERE doc_id % 2 = 0")
      .createOrReplaceTempView("tf_cap_docs_v2")
    val sqlDiff = spark.sql(
      "SELECT * FROM corpus_diff('tf_cap_docs', 'tf_cap_docs_v2', 'src', 'text')")
    val apiDiff = graft.operators.Diff.corpusDiff(
      spark.table("tf_cap_docs"), spark.table("tf_cap_docs_v2"), "src", "text")
    assert(sqlDiff.exceptAll(apiDiff).count() === 0)
    assert(apiDiff.exceptAll(sqlDiff).count() === 0)
    spark.catalog.dropTempView("tf_cap_docs_v2")
    spark.catalog.dropTempView("tf_cap_docs")
  }

  test("table functions: bad table or non-literal args raise user errors") {
    val spark = graft.TestSession.spark
    GraftExtensions.registerAll(spark)
    val e = intercept[AnalysisException] {
      spark.sql("SELECT * FROM pack_sequences('no_such_table_xyz', 'id', 't', 8)")
        .collect()
    }
    assert(e.getMessage.contains("no_such_table_xyz"))
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT * FROM dedup_spans('x', 'id', 'text')").collect()
    }
    assert(e2.getCondition === "USER_RAISED_EXCEPTION")
    assert(e2.getMessage.contains("expected >= 4"))
  }
}
