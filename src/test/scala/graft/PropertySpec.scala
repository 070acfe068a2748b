package graft

import graft.etl.{ActionDedup, Fixtures}
import graft.functions.Sim
import graft.query.Paging
import graft.schema._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5: adopt ScalaCheck where the
  * reference has table-driven matrices — dedup invariants, filter
  * operator matrix, paging arithmetic).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, min: Int = 10): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSession.spark
  import spark.implicits._

  private val ts0 = new java.sql.Timestamp(1700000000000L)
  private def mkTrace(trx: Int, digest: Int, gs: Long): RawTrace =
    RawTrace(ts0, 1L + trx, f"b$trx%04d", "p", s"trx$trx", 1, 0,
      Act("c", "a", Seq(Authorization("x", "active")), "{}"),
      Receipt(s"recv${gs % 3}", gs, 1L, Nil), s"dig$digest", 1, 1, Nil)

  test("dedup invariants: receipts conserved, groups = distinct (trx,digest), gs = min") {
    val genTraces = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        trx <- Gen.choose(0, 5)
        digest <- Gen.choose(0, 4)
      } yield (trx, digest))
    } yield rows.zipWithIndex.map { case ((t, dg), i) => mkTrace(t, dg, 1000L + i) }

    check(Prop.forAll(genTraces) { traces =>
      val ds = spark.createDataset(traces)
      val out = ActionDedup.mergeReceipts(ds).cache()
      val receiptsOut = out.select(explode($"receipts")).count()
      val expectedGroups = traces.map(t => (t.trx_id, t.act_digest)).toSet.size
      val gsOk = out.select($"global_sequence", $"receipts").collect().forall { r =>
        r.getLong(0) == r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).min
      }
      receiptsOut == traces.size &&
        out.count() == expectedGroups.toLong &&
        gsOk
    }, 15)
  }

  test("minhash estimate is within statistical bounds of exact jaccard") {
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val genDoc = Gen.choose(5, 20).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    check(Prop.forAll(genDoc, genDoc) { (a, b) =>
      val sa = a.toSet; val sb = b.toSet
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val df = Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("id", "text")
        .select($"id", Sim.minHash(Sim.shingles($"text", 1), 256).as("sig"))
      val sigs = df.orderBy($"id").collect().map(_.getSeq[Long](1))
      val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 256.0
      // 256 hashes → σ = sqrt(J(1-J)/256) ≤ 0.032; allow 5σ
      math.abs(exact - est) <= 0.16
    }, 10)
  }

  test("jaccard column function equals set-arithmetic jaccard") {
    val genSet = Gen.choose(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 20).map(i => s"t$i")))
    check(Prop.forAll(genSet, genSet) { (a, b) =>
      val expected = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
      val got = Seq((a.distinct, b.distinct)).toDF("a", "b")
        .select(Sim.jaccard($"a", $"b")).as[Double].head()
      math.abs(got - expected) < 1e-12
    }, 20)
  }

  test("posOffset: window always non-negative, sized |offset|+1") {
    check(Prop.forAll(Gen.choose(-1L, 10000L), Gen.choose(-500L, 500L)) { (pos, off) =>
      val (skip, limit, _) = Paging.posOffset(pos, off)
      skip >= 0 && limit == math.abs(off) + 1
    })
  }

  test("base58 round-trips arbitrary byte strings, including leading zeros") {
    import graft.functions.AntelopeKeys
    val genBytes = for {
      zeros <- Gen.choose(0, 4)
      n <- Gen.choose(0, 64)
      body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield Array.fill[Byte](zeros)(0) ++ body.toArray
    check(Prop.forAll(genBytes) { b =>
      AntelopeKeys.base58Decode(AntelopeKeys.base58Encode(b))
        .exists(_.sameElements(b))
    }, 50)
  }

  test("any 33-byte payload round-trips legacy↔K1 with valid checksums") {
    import graft.functions.AntelopeKeys
    val genPayload = Gen.listOfN(33, Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    check(Prop.forAll(genPayload) { p =>
      val legacy = AntelopeKeys.encodeLegacy(p)
      val k1 = AntelopeKeys.encodeK1(p)
      AntelopeKeys.normalize(legacy).contains(k1) &&
        AntelopeKeys.toLegacy(k1).contains(legacy) &&
        AntelopeKeys.decode(legacy).exists(_.sameElements(p)) &&
        AntelopeKeys.decode(k1).exists(_.sameElements(p))
    }, 30)
  }

  test("simhash of identical token multisets is identical; hamming symmetric") {
    val genDoc = Gen.choose(3, 15).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 10).map(i => s"w$i")))
    check(Prop.forAll(genDoc) { doc =>
      val df = Seq((1L, doc.mkString(" ")), (2L, doc.mkString(" "))).toDF("id", "text")
        .select(Sim.simHash(graft.functions.Text.tokens($"text")).as("sh"))
      val hs = df.as[Long].collect()
      hs(0) == hs(1)
    }, 10)
  }

  test("NearestCentroid equals argmax over per-centroid CosineSim on random vectors") {
    // every random case pays fresh Catalyst planning + codegen (the
    // centroid literals defeat the plan cache), so keep the case count
    // small and compute BOTH forms in one plan — the fixed-vector
    // equivalence cases live in NearestCentroidSpec
    val genCase = for {
      dim <- Gen.choose(2, 6)
      k <- Gen.choose(2, 4)
      cents <- Gen.listOfN(k, Gen.listOfN(dim, Gen.choose(-5.0, 5.0)))
      n <- Gen.choose(1, 8)
      vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f)))
    } yield (cents.zipWithIndex.map { case (c, i) => (i, c: Seq[Double]) },
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) })

    check(Prop.forAll(genCase) { case (cents, vecs) =>
      val structForm = greatest(cents.map { case (cid, c) =>
        struct(graft.exprs.CosineSim($"v", array(c.map(lit): _*)).as("sim"),
          lit(cid).as("cid"))
      }: _*).getField("cid")
      vecs.toDF("id", "v")
        .select(graft.exprs.NearestCentroid($"v", cents).as("a"),
          structForm.as("b"))
        .as[(Int, Int)].collect().forall { case (a, b) => a == b }
    }, 5)
  }

  test("packing tiles every partition's token stream: no gap, no overlap") {
    val genDocs = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        part <- Gen.oneOf("a", "b", "c")
        toks <- Gen.choose(0L, 40L)
      } yield (part, toks))
      budget <- Gen.choose(1L, 64L)
    } yield (rows.zipWithIndex.map { case ((p, t), i) => (i.toLong, p, t) }, budget)

    check(Prop.forAll(genDocs) { case (rows, budget) =>
      val got = graft.operators.Pack.packSequences(
          rows.toDF("id", "part", "n"), "id", col("n"), budget, Seq("part"))
        .select($"part", $"id", $"n_tokens", $"pack_id", $"pack_offset")
        .as[(String, Long, Long, Long, Long)].collect()
        .groupBy(_._1)
      got.forall { case (_, docs) =>
        val sorted = docs.sortBy(_._2)
        var cum = 0L
        sorted.forall { case (_, _, n, packId, off) =>
          val ok = packId == cum / budget && off == cum % budget
          cum += n; ok
        }
      }
    }, 30)
  }

  test("selectByBudget equals the global greedy for arbitrary scores and budgets") {
    val genCase = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        score <- Gen.oneOf(0.1, 0.25, 0.5, 0.5, 0.9) // deliberate tie mass
        toks <- Gen.choose(0L, 30L)
      } yield (score, toks))
      budget <- Gen.choose(0L, 400L)
    } yield (rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }, budget)

    check(Prop.forAll(genCase) { case (rows, budget) =>
      val got = graft.operators.Selection.selectByBudget(
          rows.toDF("id", "s", "n"), "id", col("s"), col("n"), budget)
        .select($"id").as[Long].collect().toSet
      var acc = 0L
      val expect = rows.sortBy { case (id, s, _) => (-s, id) }
        .filter { case (_, _, n) => val take = acc < budget; acc += n; take }
        .map(_._1).toSet
      got == expect
    }, 30)
  }

  test("VP8L round-trips arbitrary ARGB images, with and without subtract-green") {
    import graft.operators.Vp8lCodec
    val genImage = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 24)
      sg <- Gen.oneOf(true, false)
      px <- Gen.listOfN(w * h, Gen.choose(Int.MinValue, Int.MaxValue))
    } yield (w, h, sg, px.toArray)
    check(Prop.forAll(genImage) { case (w, h, sg, px) =>
      Vp8lCodec.decode(Vp8lCodec.encode(w, h, px, sg))
        .exists(d => d.width == w && d.height == h && d.argb.sameElements(px))
    }, 30)
  }

  test("FLAC round-trips arbitrary 16-bit PCM across strategies and stereo modes") {
    import graft.operators.FlacCodec
    val genStream = for {
      n <- Gen.choose(1, 700)
      ch <- Gen.oneOf(1, 2)
      strategy <- Gen.oneOf("verbatim", "fixed2", "lpc")
      stereo <- if (ch == 2) Gen.oneOf("independent", "leftside", "sideright", "midside")
                else Gen.const("independent")
      blockSize <- Gen.oneOf(128, 192, 256)
      samples <- Gen.listOfN(n * ch, Gen.choose(-32768, 32767))
    } yield (samples.toArray, ch, strategy, stereo, blockSize)
    check(Prop.forAll(genStream) { case (s, ch, strategy, stereo, bs) =>
      FlacCodec.decode(FlacCodec.encode(s, 8000, ch, 16, bs, strategy, stereo))
        .exists(_.samples.sameElements(s))
    }, 30)
  }
}
