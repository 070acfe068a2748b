package graft.exprs

import org.apache.spark.sql.{AnalysisException, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions AND its text-analysis compositions for SQL use. Activate
  * with `SparkSession.builder().withExtensions(new GraftExtensions)`,
  * `spark.sql.extensions=graft.exprs.GraftExtensions`, or on a LIVE
  * session with [[GraftExtensions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    GraftExtensions.tableFunctions.foreach(e.injectTableFunction)
  }
}

object GraftExtensions {

  /** Register every function on an already-built session (tests,
    * notebooks, REPLs — where `withExtensions` is no longer an option).
    */
  def registerAll(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    tableFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
    }
  }

  private type Fn =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): Fn =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) =>
        // constructor require()s (n > 0 etc.) are argument validation too:
        // surface them under the same user-error class as arity/literal
        // failures, never as a raw IllegalArgumentException
        try builder(children) catch {
          case e: IllegalArgumentException =>
            userError(s"$name: ${e.getMessage}")
        })

  private[exprs] lazy val functions: Seq[Fn] = {
    import org.apache.spark.sql.GraftShim.{column, eagerExpression => expression}
    import graft.functions.Text
    Seq(
      fn("cosine_sim", classOf[CosineSim]) { children =>
        expectArity("cosine_sim(a, b)", children, 2)
        CosineSim(children(0), children(1))
      },
      fn("shingles", classOf[Shingles]) { children =>
        expectArity("shingles(text, n)", children, 2)
        Shingles(children(0), intLit(children(1), "shingles(text, n)", "n"))
      },
      fn("simhash64", classOf[SimHash64]) { children =>
        expectArity("simhash64(tokens)", children, 1)
        SimHash64(children(0))
      },
      fn("minhash_sig", classOf[MinHashSig]) { children =>
        expectArity("minhash_sig(tokens, numHashes)", children, 2)
        MinHashSig(children(0),
          intLit(children(1), "minhash_sig(tokens, numHashes)", "numHashes"))
      },
      fn("hyperplane_buckets", classOf[HyperplaneBuckets]) { children =>
        val f = "hyperplane_buckets(vec, tables, planes, dim)"
        expectArity(f, children, 4)
        HyperplaneBuckets(children(0),
          intLit(children(1), f, "tables"), intLit(children(2), f, "planes"),
          intLit(children(3), f, "dim"))
      },
      fn("lsh_band_keys", classOf[LshBandKeys]) { children =>
        val f = "lsh_band_keys(sig, bands, rows)"
        expectArity(f, children, 3)
        LshBandKeys(children(0),
          intLit(children(1), f, "bands"), intLit(children(2), f, "rows"))
      },
      // text-analysis compositions: the builder expands the same Column
      // composition the Scala API uses, so SQL and DataFrame callers
      // share one definition (and one set of specs/oracles)
      fn("token_count", Text.getClass) { children =>
        expectArity("token_count(text)", children, 1)
        expression(Text.tokenCount(column(children(0))))
      },
      fn("quality_score", Text.getClass) { children =>
        expectArity("quality_score(text)", children, 1)
        expression(Text.qualityScore(column(children(0))))
      },
      fn("repetition_score", Text.getClass) { children =>
        val f = "repetition_score(text, n)"
        expectArity(f, children, 2)
        expression(Text.repetitionScore(column(children(0)),
          intLit(children(1), f, "n")))
      },
      fn("exact_key", Text.getClass) { children =>
        expectArity("exact_key(text)", children, 1)
        expression(Text.exactKey(column(children(0))))
      },
      fn("doc_fingerprint", Text.getClass) { children =>
        expectArity("doc_fingerprint(text)", children, 1)
        expression(Text.fingerprint(column(children(0))))
      },
      fn("normalize_text", classOf[NormalizeText]) { children =>
        expectArity("normalize_text(text)", children, 1)
        NormalizeText(children(0))
      },
      fn("fix_mojibake", classOf[FixMojibake]) { children =>
        expectArity("fix_mojibake(text)", children, 1)
        FixMojibake(children(0))
      },
      fn("nfc_normalize", classOf[NfcNormalize]) { children =>
        expectArity("nfc_normalize(text)", children, 1)
        NfcNormalize(children(0))
      },
      fn("redact_pii", Text.getClass) { children =>
        expectArity("redact_pii(text)", children, 1)
        expression(Text.redactPii(column(children(0))))
      },
      fn("char_entropy", classOf[CharEntropy]) { children =>
        expectArity("char_entropy(text)", children, 1)
        CharEntropy(children(0))
      },
      fn("winnow_keys", classOf[WinnowKeys]) { children =>
        val f = "winnow_keys(text, k, w)"
        expectArity(f, children, 3)
        WinnowKeys(children(0), intLit(children(1), f, "k"),
          intLit(children(2), f, "w"))
      },
      fn("gram_keys", classOf[GramKeys]) { children =>
        val f = "gram_keys(text, k)"
        expectArity(f, children, 2)
        GramKeys(children(0), intLit(children(1), f, "k"))
      },
      fn("cdc_cuts", classOf[CdcCuts]) { children =>
        val f = "cdc_cuts(text, k, maskBits)"
        expectArity(f, children, 3)
        CdcCuts(children(0), intLit(children(1), f, "k"),
          intLit(children(2), f, "maskBits"))
      })
  }

  private type TFn = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private def tfn(name: String, clazz: Class[_])(
      builder: Seq[Expression] => org.apache.spark.sql.DataFrame): TFn =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) =>
        (try builder(children) catch {
          case e: IllegalArgumentException => userError(s"$name: ${e.getMessage}")
        }).queryExecution.logical)

  /** WHOLE-OPERATOR table functions: the training-data flow's table→table
    * stages callable from pure SQL —
    *
    *   SELECT * FROM dedup_spans('documents', 'doc_id', 'text', 10, 'lang')
    *   SELECT * FROM pack_sequences('documents', 'doc_id',
    *                                'token_count(text)', 2048, 'lang')
    *
    * The builder resolves the named table/view through the ACTIVE session
    * (analysis-time — exactly when table functions are expanded) and
    * returns the same logical plan the Scala API builds, so both surfaces
    * share one operator definition, one plan shape, and one oracle. The
    * tokens argument of pack_sequences is an SQL expression string,
    * evaluated against the input table's columns.
    */
  private[exprs] lazy val tableFunctions: Seq[TFn] = Seq(
    tfn("dedup_spans", graft.operators.Dedup.getClass) { children =>
      val f = "dedup_spans(table, idCol, textCol, spanTokens, carryCol...)"
      if (children.size < 4) userError(s"$f: expected >= 4 arguments")
      graft.operators.Dedup.dedupSpans(
        SparkSession.active.table(stringLit(children(0), f, "table")),
        stringLit(children(1), f, "idCol"),
        stringLit(children(2), f, "textCol"),
        intLit(children(3), f, "spanTokens"),
        children.drop(4).zipWithIndex.map { case (c, i) =>
          stringLit(c, f, s"carryCol[$i]") })
    },
    tfn("compressed_members", graft.operators.Codecs.getClass) { children =>
      val f = "compressed_members(table, idCol, payloadCol)"
      expectArity(f, children, 3)
      val t = SparkSession.active.table(stringLit(children(0), f, "table"))
      graft.operators.Codecs.parseMembers(
        t.select(
          org.apache.spark.sql.functions
            .col(stringLit(children(1), f, "idCol")).as("doc_id"),
          org.apache.spark.sql.functions
            .col(stringLit(children(2), f, "payloadCol")).as("payload")))(
        SparkSession.active).toDF()
    },
    tfn("pack_sequences", graft.operators.Pack.getClass) { children =>
      val f = "pack_sequences(table, idCol, tokensExpr, budget, partitionCol...)"
      if (children.size < 4) userError(s"$f: expected >= 4 arguments")
      graft.operators.Pack.packSequences(
        SparkSession.active.table(stringLit(children(0), f, "table")),
        stringLit(children(1), f, "idCol"),
        org.apache.spark.sql.functions.expr(
          stringLit(children(2), f, "tokensExpr")),
        intLit(children(3), f, "budget").toLong,
        children.drop(4).zipWithIndex.map { case (c, i) =>
          stringLit(c, f, s"partitionCol[$i]") })
    },
    tfn("chunk_docs", graft.operators.Chunk.getClass) { children =>
      val f = "chunk_docs(table, idCol, textCol, chunkSize, stride)"
      expectArity(f, children, 5)
      graft.operators.Chunk.chunkDocs(
        SparkSession.active.table(stringLit(children(0), f, "table")),
        stringLit(children(1), f, "idCol"),
        stringLit(children(2), f, "textCol"),
        intLit(children(3), f, "chunkSize"),
        intLit(children(4), f, "stride"))
    },
    tfn("cap_per_group", graft.operators.Selection.getClass) { children =>
      val f = "cap_per_group(table, groupCol, idCol, cap[, salt])"
      if (children.size < 4 || children.size > 5)
        userError(s"$f: expected 4 or 5 arguments, got ${children.size}")
      graft.operators.Selection.capPerGroup(
        SparkSession.active.table(stringLit(children(0), f, "table")),
        stringLit(children(1), f, "groupCol"),
        stringLit(children(2), f, "idCol"),
        intLit(children(3), f, "cap"),
        if (children.size == 5) stringLit(children(4), f, "salt") else "cap")
    },
    tfn("corpus_diff", graft.operators.Diff.getClass) { children =>
      val f = "corpus_diff(tableA, tableB, groupCol, textCol)"
      expectArity(f, children, 4)
      graft.operators.Diff.corpusDiff(
        SparkSession.active.table(stringLit(children(0), f, "tableA")),
        SparkSession.active.table(stringLit(children(1), f, "tableB")),
        stringLit(children(2), f, "groupCol"),
        stringLit(children(3), f, "textCol"))
    })

  private[exprs] def stringLit(e: Expression, fn: String, name: String): String =
    e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) if v != null =>
        v.toString
      case other => userError(s"$fn: $name must be a string literal, got $other")
    }

  /** Malformed calls (wrong arity, non-literal argument) are USER errors:
    * raise them under a user-facing error class — not INTERNAL_ERROR,
    * which renders as an engine-bug banner — and never let a raw
    * ClassCastException escape the builder.
    */
  private[exprs] def userError(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> msg))

  private[exprs] def intLit(e: Expression, fn: String, name: String): Int = e match {
    case Literal(v, dt)
        if (dt == IntegerType || dt == LongType || dt == ShortType ||
          dt == ByteType) && v != null =>
      v.toString.toInt
    case other => userError(s"$fn: $name must be an integer literal, got $other")
  }

  private[exprs] def expectArity(fn: String, children: Seq[Expression], n: Int): Unit =
    if (children.size != n)
      userError(s"$fn: expected $n arguments, got ${children.size}")
}
