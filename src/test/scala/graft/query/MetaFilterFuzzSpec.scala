package graft.query

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

// Top-level fixture types so Spark's Product encoder sees stable names.
// Boxed field types make every leaf nullable, like real document data.
case class FzInner(q: java.lang.Long)
case class FzArrEl(k: String, v: java.lang.Long, inner: Seq[FzInner])
case class FzSt(x: java.lang.Long, y: String)
case class FzDoc(id: Long, s: String, n: java.lang.Long, d: java.lang.Double,
    b: java.lang.Boolean, st: FzSt, arr: Seq[FzArrEl], tags: Seq[String],
    data: String)

/** Fuzz `MetaFilters.compile` against an independently written
  * row-at-a-time evaluator of the same documented semantics
  * (common_functions.ts:260-339 re-expressed over typed columns): dotted
  * struct paths, array-any descent, explicit `arr[i]`, opaque-JSON
  * fallback, asset and numeric coercions, null-never-matches.
  *
  * ≥1000 random (document, filter) verdict pairs per run. Divergences
  * found while building this spec — ANSI casts/element_at turning odd
  * rows into failed queries, driver-side NumberFormatException on
  * type-implausible values, value-truncation on `n eq "2.5"` — were
  * fixed in MetaFilters; this spec keeps them fixed.
  */
class MetaFilterFuzzSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSession.spark

  // ---- generators -------------------------------------------------------

  private val strPool = Seq("alice", "bob", "payment 3", "12.5000 EOS",
    "3.0000 TST", "12.5", "7", "foo EOS", "abc")

  private def nullably[A >: Null](g: Gen[A]): Gen[A] =
    Gen.frequency(8 -> g, 2 -> Gen.const(null: A))

  private val genInner: Gen[FzInner] =
    nullably(Gen.choose(0L, 9L).map(java.lang.Long.valueOf)).map(FzInner(_))

  private val genArrEl: Gen[FzArrEl] = for {
    k <- nullably(Gen.oneOf(strPool))
    v <- nullably(Gen.choose(-5L, 30L).map(java.lang.Long.valueOf))
    inner <- Gen.choose(0, 2).flatMap(Gen.listOfN(_, genInner))
  } yield FzArrEl(k, v, inner)

  private val genBlob: Gen[String] = nullably(for {
    from <- Gen.option(Gen.oneOf("alice", "bob", "carol"))
    amount <- Gen.option(Gen.oneOf("0", "7", "12.5", "100"))
    z <- Gen.option(Gen.oneOf("1", "2", "42", "2.5"))
  } yield (from.map(f => s""""from":"$f"""").toList ++
      amount.map(a => s""""amount":$a""").toList ++
      z.map(zz => s""""nested":{"z":$zz}""").toList)
    .mkString("{", ",", "}"))

  private def genDoc(id: Int): Gen[FzDoc] = for {
    s <- nullably(Gen.oneOf(strPool))
    n <- nullably(Gen.choose(-5L, 120L).map(java.lang.Long.valueOf))
    d <- nullably(Gen.oneOf(0.0, 1.0, 2.5, 12.5, -3.0, 100.0)
      .map(java.lang.Double.valueOf))
    b <- nullably(Gen.oneOf(true, false).map(java.lang.Boolean.valueOf))
    st <- nullably(for {
      x <- nullably(Gen.choose(0L, 50L).map(java.lang.Long.valueOf))
      y <- nullably(Gen.oneOf(strPool))
    } yield FzSt(x, y))
    arr <- nullably(Gen.choose(0, 3).flatMap(Gen.listOfN(_, genArrEl))
      .map(l => l: Seq[FzArrEl]))
    tags <- nullably(Gen.choose(0, 3)
      .flatMap(Gen.listOfN(_, Gen.oneOf("red", "blue", "green", "12")))
      .map(l => l: Seq[String]))
    data <- genBlob
  } yield FzDoc(id, s, n, d, b, st, arr, tags, data)

  private case class P(path: String, kind: String)
  private val paths = Seq(P("s", "str"), P("n", "num"), P("d", "num"),
    P("b", "bool"), P("st.x", "num"), P("st.y", "str"), P("arr.k", "str"),
    P("arr.v", "num"), P("arr.inner.q", "num"), P("arr[0].k", "str"),
    P("arr[1].v", "num"), P("tags", "str"), P("data.from", "str"),
    P("data.amount", "str"), P("data.nested.z", "str"))

  private val genFilter: Gen[MetaFilter] = for {
    p <- Gen.oneOf(paths)
    op <- p.kind match {
      case "bool" => Gen.oneOf("eq", "ne")
      case "num"  => Gen.oneOf("eq", "ne", "gt", "gte", "lt", "lte")
      case _ => Gen.oneOf("eq", "ne", "gt", "gte", "lt", "lte", "contains",
        "starts_with", "ends_with")
    }
    v <- p.kind match {
      case "bool" => Gen.oneOf("true", "false", "maybe")
      case "num" => Gen.frequency(8 -> Gen.oneOf("0", "2", "7", "12.5",
        "2.5", "-3", "100"), 1 -> Gen.const("abc"), 1 -> Gen.const("1e2"))
      case _ => Gen.oneOf("alice", "bob", "12.5000 EOS", "3.0000 TST",
        "1.0 EOS", "12.5", "7", "payment", "a", "EOS", "")
    }
  } yield MetaFilter(p.path, op, v)

  // ---- independent evaluator -------------------------------------------

  private val cmpOps = Set("eq", "ne", "gt", "gte", "lt", "lte")
  private val assetRe = "^(-?\\d+(?:\\.\\d+)?) ([A-Z]{1,7})$".r
  private val numericLit = "^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"
  private val plainNumLit = "^-?\\d+(\\.\\d+)?$"

  private def jsonTok(blob: String, key: String): Option[String] =
    Option(blob).flatMap { b =>
      ("\"" + key + "\":(?:\"([^\"]*)\"|([-0-9.eE]+))").r.findFirstMatchIn(b)
        .map(m => Option(m.group(1)).getOrElse(m.group(2)))
    }

  /** Every leaf value the path can reach in this document (array paths
    * yield one candidate per element; nulls and missing steps yield
    * none). A filter matches iff any candidate satisfies the predicate —
    * exactly the compiled exists/null semantics.
    */
  private def candidates(dc: FzDoc, path: String): Seq[Any] = {
    val arr = Option(dc.arr).getOrElse(Nil)
    path match {
      case "s" => Option(dc.s).toSeq
      case "n" => Option(dc.n).map(_.longValue).toSeq
      case "d" => Option(dc.d).map(_.doubleValue).toSeq
      case "b" => Option(dc.b).map(_.booleanValue).toSeq
      case "st.x" => Option(dc.st).flatMap(s => Option(s.x)).map(_.longValue).toSeq
      case "st.y" => Option(dc.st).flatMap(s => Option(s.y)).toSeq
      case "arr.k" => arr.flatMap(e => Option(e.k))
      case "arr.v" => arr.flatMap(e => Option(e.v).map(_.longValue))
      case "arr.inner.q" => arr.flatMap(e => Option(e.inner).getOrElse(Nil)
        .flatMap(i => Option(i.q).map(_.longValue)))
      case "arr[0].k" => arr.lift(0).flatMap(e => Option(e.k)).toSeq
      case "arr[1].v" => arr.lift(1).flatMap(e => Option(e.v).map(_.longValue)).toSeq
      case "tags" => Option(dc.tags).getOrElse(Nil).filter(_ != null)
      case "data.from" => jsonTok(dc.data, "from").toSeq
      case "data.amount" => jsonTok(dc.data, "amount").toSeq
      case "data.nested.z" => jsonTok(dc.data, "z").toSeq
      case other => fail(s"unmapped path $other")
    }
  }

  private def cmpD(l: Double, r: Double, op: String): Boolean = op match {
    case "eq" => l == r;  case "ne" => l != r
    case "gt" => l > r;   case "gte" => l >= r
    case "lt" => l < r;   case "lte" => l <= r
  }

  private def numPred(l: Double, op: String, v: String): Boolean =
    v.toDoubleOption match {
      case Some(r) => cmpD(l, r, op)
      case None    => op == "ne" // un-number: only inequality holds
    }

  private def strOp(s: String, op: String, v: String): Boolean = op match {
    case "eq" => s == v;  case "ne" => s != v
    case "gt" => s > v;   case "gte" => s >= v
    case "lt" => s < v;   case "lte" => s <= v
    case "contains" => s.contains(v)
    case "starts_with" => s.startsWith(v)
    case "ends_with" => s.endsWith(v)
  }

  private def predRef(leaf: Any, op: String, v: String): Boolean = leaf match {
    case null => false
    case s: String => (v, op) match {
      case (assetRe(num, sym), o) if cmpOps(o) =>
        val parts = s.split(" ", -1)
        parts.lift(1).contains(sym) &&
          parts.headOption.filter(_.matches(numericLit))
            .exists(t => cmpD(t.toDouble, num.toDouble, o))
      case (vv, o) if cmpOps(o) && vv.matches(plainNumLit) =>
        s.matches(numericLit) && cmpD(s.toDouble, vv.toDouble, o)
      case _ => strOp(s, op, v)
    }
    case l: Long => numPred(l.toDouble, op, v)
    case d: Double => numPred(d, op, v)
    case b: Boolean => v.toBooleanOption match {
      case Some(vb) => if (op == "eq") b == vb else b != vb
      case None     => op == "ne"
    }
    case other => fail(s"unexpected leaf $other")
  }

  private def matchesRef(dc: FzDoc, f: MetaFilter): Boolean =
    candidates(dc, f.field).exists(predRef(_, f.operator, f.value))

  // ---- the fuzz ---------------------------------------------------------

  test("compiled predicates agree with the independent evaluator on ≥1000 random cases") {
    val genCase = for {
      nDocs <- Gen.choose(8, 16)
      docs <- Gen.sequence[List[FzDoc], FzDoc]((0 until nDocs).map(genDoc))
      filters <- Gen.choose(24, 36).flatMap(Gen.listOfN(_, genFilter))
    } yield (docs, filters)

    var cases = 0L
    val prop = Prop.forAll(genCase) { case (docs, filters) =>
      val df = spark.createDataFrame(docs)
      val cols = filters.zipWithIndex.map { case (f, i) =>
        MetaFilters.compile(df, f).as(s"f$i")
      }
      val rows = df.select(col("id") +: cols: _*).collect()
      val byId = docs.map(d => d.id -> d).toMap
      val diverging = for {
        row <- rows
        doc = byId(row.getLong(0))
        (f, i) <- filters.zipWithIndex
        actual = !row.isNullAt(i + 1) && row.getBoolean(i + 1)
        expected = matchesRef(doc, f)
        if actual != expected
      } yield s"$f on doc ${doc.id} ($doc): spark=$actual ref=$expected"
      cases += filters.size
      if (diverging.nonEmpty) {
        info(diverging.take(5).mkString("\n"))
      }
      diverging.isEmpty
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
    info(s"filter cases checked: $cases")
    assert(cases >= 1000, s"only $cases cases — raise the generator sizes")
  }

  test("filter_op composes: and/or over two filters equals the boolean combine") {
    val genPair = for {
      docs <- Gen.sequence[List[FzDoc], FzDoc]((0 until 10).map(genDoc))
      f1 <- genFilter
      f2 <- genFilter
      andMode <- Gen.oneOf(true, false)
    } yield (docs, f1, f2, andMode)
    val prop = Prop.forAll(genPair) { case (docs, f1, f2, andMode) =>
      val df = spark.createDataFrame(docs)
      val combined = df.filter(MetaFilters.compileAll(df, Seq(f1, f2), andMode))
        .select("id").collect().map(_.getLong(0)).toSet
      val expected = docs.filter { d =>
        if (andMode) matchesRef(d, f1) && matchesRef(d, f2)
        else matchesRef(d, f1) || matchesRef(d, f2)
      }.map(_.id).toSet
      combined == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
