package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch: the one-sided error contract (est ≥ true, with
  * equality when nothing collides), cell-wise mergeability (the property
  * that makes it a sketch and not a sample), and the plan shapes that
  * carry the 100 TB claim — a partial-aggregated sketch build and a
  * broadcast estimate join.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // a skewed stream: token t_i appears i times — exact counts known
  private lazy val stream = (1 to 40).flatMap(i => Seq.fill(i)(s"t$i"))
    .toDF("tok")
  private val exact: Map[String, Long] = (1 to 40).map(i => s"t$i" -> i.toLong).toMap

  test("estimate is one-sided: est >= exact for every key, even in a tiny sketch") {
    // width 8 << 40 keys forces collisions in every row
    val sketch = Sketch.countMin(stream, "tok", depth = 3, width = 8)
    val est = Sketch.estimate(sketch, stream.distinct(), "tok", 3, 8)
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: est ${est(t)} under-counts $c")
    }
  }

  test("with a wide sketch the estimates are exact (no collisions at 40 keys)") {
    val sketch = Sketch.countMin(stream, "tok", depth = 4, width = 4096)
    val est = Sketch.estimate(sketch, stream.distinct(), "tok", 4, 4096)
      .as[(String, Long)].collect().toMap
    assert(est === exact)
  }

  test("sketches merge cell-wise: sketch(A) + sketch(B) == sketch(A union B)") {
    val a = stream.filter(col("tok") < "t3")
    val b = stream.filter(col("tok") >= "t3")
    val merged = Sketch.countMin(a, "tok", 3, 64)
      .unionByName(Sketch.countMin(b, "tok", 3, 64))
      .groupBy("d", "b").agg(sum("c").as("c"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.countMin(stream, "tok", 3, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }

  test("heavy hitters: every true heavy key survives; order is est desc, key asc") {
    val hh = Sketch.heavyHitters(stream, "tok", depth = 3, width = 8, k = 10)
      .as[(String, Long)].collect()
    assert(hh.length === 10)
    // one-sided error can only PROMOTE light keys past true heavies at
    // equal estimate — but the top-10 TRUE counts are 31..40, and any
    // estimate of t31..t40 is >= its true count, so a key can displace
    // one of them only by estimating above 31: possible for a light key,
    // impossible for the heaviest. The heaviest key must be ranked first
    // or tied-at-top.
    assert(hh.head._2 >= 40L)
    // monotone non-increasing estimates with asc key tiebreak
    hh.sliding(2).foreach { case Array((ka, ea), (kb, eb)) =>
      assert(ea > eb || (ea == eb && ka < kb))
    }
  }

  test("sketch build partial-aggregates before the exchange (shuffle is sketch-sized)") {
    val plan = Sketch.countMin(stream, "tok", 4, 512)
      .queryExecution.executedPlan.toString
    // partial_count below the shuffle → map tasks emit <= depth*width rows
    assert(plan.contains("partial_count"),
      s"sketch build must map-side combine:\n$plan")
  }

  test("estimate joins the sketch by broadcast — no probe-side pre-shuffle") {
    val sketch = Sketch.countMin(stream, "tok", 4, 512)
    val plan = Sketch.estimate(sketch, stream.distinct(), "tok", 4, 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"estimate must broadcast the sketch:\n$plan")
  }

  // ----------------------------------------------------------- HyperLogLog

  private def hllOf(n: Int, p: Int = 6): Double = {
    val df = (0 until n).map(i => ("g", s"user$i")).toDF("g", "v")
    Sketch.hllEstimate(Sketch.hllSketch(df, "g", "v", p), "g", p)
      .as[(String, Double)].head()._2
  }

  test("HLL estimate lands inside the m=64 error envelope at 5000 distinct keys") {
    val est = hllOf(5000)
    // std error 1.04/sqrt(64) ~ 13%; 3 sigma ~ 39%
    assert(math.abs(est - 5000) / 5000.0 < 0.39, s"est $est too far from 5000")
  }

  test("HLL linear counting is near-exact at tiny cardinalities") {
    val est = hllOf(10)
    // with 64 registers and 10 keys the linear-counting branch estimates
    // m*ln(m/V) — near-exact unless two keys collide into one register
    assert(est >= 9.0 && est <= 12.0, s"linear-counting estimate $est not near 10")
  }

  test("HLL registers merge by bucket-wise max: merge(A,B) == sketch(A union B)") {
    val a = (0 until 300).map(i => ("g", s"user$i")).toDF("g", "v")
    val b = (150 until 500).map(i => ("g", s"user$i")).toDF("g", "v")
    val merged = Sketch.hllSketch(a, "g", "v", 6)
      .unionByName(Sketch.hllSketch(b, "g", "v", 6))
      .groupBy("g", "bucket").agg(max("mr").as("mr"))
      .as[(String, Long, Int)].collect().toSet
    val whole = Sketch.hllSketch(a.unionByName(b), "g", "v", 6)
      .as[(String, Long, Int)].collect().toSet
    assert(merged === whole)
  }

  test("HLL registers replay from md5 in SQL (the oracle derivation)") {
    val df = Seq(("g", "alpha"), ("g", "beta")).toDF("g", "v")
    val regs = Sketch.hllSketch(df, "g", "v", 6)
      .as[(String, Long, Int)].collect().map { case (_, b, r) => (b, r) }.toSet
    val sqlRegs = spark.sql(
      """SELECT bucket, max(r) FROM (
           SELECT shiftright(draw, 26) AS bucket,
             CASE WHEN draw % 67108864 = 0 THEN 27
                  ELSE 26 - CAST(floor(log2(draw % 67108864)) AS INT) END AS r
           FROM (SELECT CAST(conv(substring(md5(concat('hll:', v)), 1, 8), 16, 10)
                   AS BIGINT) AS draw
                 FROM VALUES ('alpha'), ('beta') AS t(v)))
         GROUP BY bucket""").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(regs === sqlRegs)
  }

  test("HLL overlap: identical populations give overlap == marginal == union exactly") {
    val df = (0 until 400).flatMap(i => Seq(("a", s"u$i"), ("b", s"u$i")))
      .toDF("g", "v")
    val row = Sketch.hllOverlap(df, "g", "v", 6)
      .as[(String, String, Double, Double, Double, Double)].head()
    val (_, _, ea, eb, eu, ov) = row
    // identical member sets → identical register files → every estimate
    // is the same number, and inclusion–exclusion returns it exactly
    assert(ea === eb && eb === eu && ov === ea)
  }

  test("HLL overlap: disjoint and half-overlapping populations estimate sanely") {
    val a = (0 until 1000).map(i => ("a", s"u$i"))
    val b = (1000 until 2000).map(i => ("b", s"u$i"))      // disjoint from a
    val c = (500 until 1500).map(i => ("c", s"u$i"))       // half-overlaps a
    val rows = Sketch.hllOverlap((a ++ b ++ c).toDF("g", "v"), "g", "v", 6)
      .as[(String, String, Double, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    // m=64 → ~13% per-estimate error; inclusion–exclusion compounds it,
    // so bounds are loose but directional: disjoint must estimate far
    // below the true half-overlap's estimate
    val dis = rows(("a", "b"))
    val half = rows(("a", "c"))
    assert(math.abs(dis) < 350, s"disjoint overlap $dis too far from 0")
    assert(half > 200 && half < 900, s"half overlap $half not near 500")
    assert(half > dis + 100, s"half ($half) must clearly exceed disjoint ($dis)")
  }

  test("HLL sketch partial-aggregates the register max before the exchange") {
    val df = (0 until 100).map(i => ("g", s"u$i")).toDF("g", "v")
    val plan = Sketch.hllSketch(df, "g", "v", 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      s"register build must map-side combine:\n$plan")
  }

  test("bucket draws replay from md5 in SQL (the oracle derivation)") {
    // the exact arithmetic the DuckDB oracle uses, run through Spark SQL:
    // CAST(conv(substring(md5('cms:d:tok'),1,8),16,10) AS BIGINT) % width
    val sketch = Sketch.countMin(Seq("alpha").toDF("tok"), "tok", 2, 512)
      .as[(Int, Long, Long)].collect()
      .map { case (d, b, _) => d -> b }.toMap
    val sqlB = (0 until 2).map { d =>
      d -> spark.sql(
        s"SELECT CAST(conv(substring(md5('cms:$d:alpha'), 1, 8), 16, 10) AS BIGINT) % 512"
      ).head().getLong(0)
    }.toMap
    assert(sketch === sqlB)
  }
}
