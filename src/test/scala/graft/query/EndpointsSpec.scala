package graft.query

import graft.SparkSpec
import graft.etl.{ActionDedup, Extensions, Fixtures}
import org.apache.spark.sql.functions._

/** Endpoint semantics mirroring the reference's API e2e assertions
  * (tests/e2e/lib/api-tests.ts): account filter restricts to involved
  * accounts, pagination pages are disjoint, simple shape fields.
  */
class EndpointsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val actions =
    Extensions.liftTransfer(
      ActionDedup.mergeReceipts(Fixtures.rawTraces(spark, 40, 20, 2))).cache()

  test("account filter restricts results to involved accounts") {
    val res = Endpoints.getActions(actions, GetActionsParams(
      account = Some("alice"), limit = Some(1000)))
    assert(res.count() > 0)
    val uninvolved = res.filter(
      !array_contains(col("notified"), "alice") &&
        !exists(col("act.authorization"), a => a.getField("actor") === "alice"))
    assert(uninvolved.count() === 0)
  }

  test("code:action filter + time range + default desc sort") {
    val res = Endpoints.getActions(actions, GetActionsParams(
      filter = Some("eosio.token:transfer"), after = Some("100"), before = Some("119"),
      limit = Some(100))).cache()
    assert(res.count() === 20)
    // default sort: global_sequence desc — merged meta keeps act struct
    val gsDesc = ActionDedup.mergeReceipts(Fixtures.rawTraces(spark, 40, 20, 2))
      .filter(col("block_num").between(100, 119))
      .agg(max(col("global_sequence"))).as[Long].head()
    assert(res.agg(max(col("global_sequence"))).as[Long].head() === gsDesc)
  }

  test("pagination pages are disjoint and ordered") {
    def page(skip: Int) = Endpoints.getActions(actions, GetActionsParams(
      skip = Some(skip), limit = Some(10)))
      .select($"global_sequence").as[Long].collect().toSeq
    val p1 = page(0); val p2 = page(10)
    assert(p1.size === 10 && p2.size === 10)
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    assert(p1.min > p2.max, "desc order: page 1 sequences all above page 2")
  }

  test("ascending sort without time bound is rejected (asc guard)") {
    intercept[IllegalArgumentException] {
      Endpoints.getActions(actions, GetActionsParams(sort = Some("asc")))
    }
  }

  test("simple projection shape (P3)") {
    val res = Endpoints.getActions(actions, GetActionsParams(
      account = Some("alice"), simple = true, limit = Some(5)))
    assert(res.columns.toSeq === Seq("block", "timestamp", "contract", "action",
      "actors", "notified", "transaction_id", "data"))
    val actors = res.select($"actors").as[String].collect()
    assert(actors.forall(_.contains("@active")))
  }

  test("noBinary truncates long data strings (P4)") {
    val res = Endpoints.getActions(actions, GetActionsParams(
      filter = Some("hyp.test:*"), noBinary = true, limit = Some(5)))
    // custom action payload is 64 x's + json wrapper < 256 → untouched;
    // check the helper directly for the >256 path
    val t = Seq(Tuple1("x" * 300), Tuple1("short")).toDF("s")
      .select(Extensions.noBinary($"s").as("s")).as[String].collect()
    assert(t(0) === "x" * 32 + "..." && t(1) === "short")
    assert(res.count() === 5)
  }

  test("mergeActionMeta folds lifted extension back into act.data (P2)") {
    val merged = Extensions.mergeActionMeta(actions)
    val data = merged.filter(col("act.name") === "transfer")
      .select(col("act.data")).as[String].head()
    assert(data.contains("\"amount\"") && data.contains("\"symbol\""))
  }

  test("getTableState: snapshot at block with keyset pagination (A10/A11)") {
    val deltas = Fixtures.deltas(spark, 120).toDF()
    val page1 = Endpoints.getTableState(deltas, "hyp.test", "kv", atBlock = 319L, pageSize = 5)
    assert(page1.count() === 5)
    val lastKey = page1.orderBy(desc("composite_key")).select($"composite_key").as[String].head()
    val page2 = Endpoints.getTableState(deltas, "hyp.test", "kv", atBlock = 319L,
      afterKey = Some(lastKey), pageSize = 5)
    assert(page2.count() > 0)
    val k1 = page1.select($"composite_key").as[String].collect().toSet
    val k2 = page2.select($"composite_key").as[String].collect().toSet
    assert(k1.intersect(k2).isEmpty)
    // snapshot correctness: value is the latest ≤ atBlock for each key
    val expected = deltas.filter($"block_num" <= 319)
      .withColumn("ck", concat($"scope", lit("-"), $"primary_key"))
      .groupBy($"ck").agg(max($"block_num").as("bn"))
    val all = Endpoints.getTableState(deltas, "hyp.test", "kv", 319L, pageSize = 1000)
    val bad = all.join(expected, all("composite_key") === expected("ck"))
      .filter(all("block_num") =!= expected("bn"))
    assert(bad.count() === 0)
  }

  test("getDeltas filters and orders") {
    val deltas = Fixtures.deltas(spark, 120).toDF()
    val res = Endpoints.getDeltas(deltas, code = Some("hyp.test"),
      scope = Some("alice,bob"), limit = Some(50))
    assert(res.count() === 50)
    assert(res.filter(!$"scope".isin("alice", "bob")).count() === 0)
  }

  test("getActionUsage: sequence-difference count + HLL actors (A5/A14)") {
    // fixture clock starts 2023-11-14 22:13:20; pick a window with
    // actions on both sides so the sequence difference is defined
    val res = Endpoints.getActionUsage(actions.toDF(),
      "2023-11-14 22:14:30", "2023-11-16 00:00:00")
    val row = res.head()
    assert(row.getLong(0) > 0)
    assert(row.getLong(1) > 0 && row.getLong(1) <= 4)
  }

  test("getResourceUsage: extended stats + percentile vector (A6/A7)") {
    val row = Endpoints.getResourceUsage(actions.toDF(), "eosio.token", "transfer").head()
    assert(row.getAs[Long]("cnt") === 40)
    assert(row.getAs[Seq[Double]]("cpu_percentiles").length === 7)
  }
}
