package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X2 lift-family guards that the driver oracle doesn't isolate:
  * contract scoping of the eosio-only lifts vs the wildcard lifts, and
  * handler guard-miss behavior.
  */
class LiftsSpec extends SparkSpec {

  import spark.implicits._

  private def acts(rows: (Long, String, String, String)*) =
    rows.toSeq.toDF("global_sequence", "account", "name", "data")
      .select(col("global_sequence"),
        struct(col("account").as("account"), col("name").as("name"),
          array(struct(lit("a").as("actor"), lit("active").as("permission")))
            .as("authorization"),
          col("data").as("data")).as("act"))

  test("transfer lifts on ANY contract; eosio-only lifts require eosio") {
    val df = Lifts.liftSystemActions(acts(
      (1L, "other.token", "transfer",
        """{"from":"a","to":"b","quantity":"1.0000 X","memo":""}"""),
      (2L, "eosio2", "delegatebw",
        """{"from":"a","receiver":"b","stake_net_quantity":"1.0000 EOS","stake_cpu_quantity":"1.0000 EOS","transfer":false}""")))
    val rows = df.select(col("global_sequence"),
      col("transfer").isNotNull.as("t"), col("delegatebw").isNotNull.as("d"))
      .orderBy(col("global_sequence")).collect()
    assert(rows(0).getBoolean(1) === true)   // *::transfer lifted
    assert(rows(1).getBoolean(2) === false)  // eosio2::delegatebw NOT lifted
  }

  test("delegatebw quantities are zero unless BOTH stake fields present") {
    val df = Lifts.liftSystemActions(acts(
      (1L, "eosio", "delegatebw",
        """{"from":"a","receiver":"b","stake_cpu_quantity":"2.0000 EOS","transfer":false}""")))
    val r = df.select(col("delegatebw.amount"), col("delegatebw.stake_cpu_quantity"))
      .head()
    assert(r.getDouble(0) === 0.0 && r.getDouble(1) === 0.0)
  }

  test("accounts delta lift is wildcard; voters requires eosio code") {
    val deltas = Seq(
      (1L, "any.token", "accounts", """{"balance":"7.5000 ZZZ"}"""),
      (2L, "notsys", "voters",
        """{"owner":"x","is_proxy":false,"proxy":"","producers":[],"last_vote_weight":"1.0","proxied_vote_weight":"0.0","staked":"1.0"}"""))
      .toDF("block_num", "code", "table", "data")
    val df = Lifts.liftSystemDeltas(deltas)
    val r = df.select(col("block_num"), col("accounts").isNotNull.as("a"),
      col("voters").isNotNull.as("v")).orderBy(col("block_num")).collect()
    assert(r(0).getBoolean(1) === true)   // *:accounts lifted
    assert(r(1).getBoolean(2) === false)  // notsys:voters NOT lifted
  }

  test("getActions folds ANY lifted extension back into act.data, not just @transfer") {
    import graft.query.{Endpoints, GetActionsParams}
    val df = Lifts.liftSystemActions(acts(
      (1L, "eosio", "delegatebw",
        """{"from":"a","receiver":"b","stake_net_quantity":"1.0000 EOS","stake_cpu_quantity":"1.0000 EOS","transfer":false}"""),
      (2L, "hyp.test", "doit", """{"id":9}""")))
      .withColumn("timestamp", lit(java.sql.Timestamp.valueOf("2023-11-14 22:00:00")))
      .withColumn("block_num", col("global_sequence"))
    val out = Endpoints.getActions(df, GetActionsParams(limit = Some(10)))
      .select(col("global_sequence"), col("act.data").as("data"))
      .orderBy(col("global_sequence")).collect()
    assert(out(0).getString(1).startsWith("""{"amount":2.0,"stake_cpu_quantity":1.0"""))
    assert(out(1).getString(1) === """{"id":9}""")
  }

  test("accounts lift requires a string balance (guard miss passes through)") {
    val deltas = Seq((1L, "tok", "accounts", """{"other":1}"""))
      .toDF("block_num", "code", "table", "data")
    val merged = Extensions.mergeDeltaMetaAll(
      Lifts.liftSystemDeltas(deltas), Lifts.deltaExtCols)
    assert(merged.select(col("data")).head().getString(0) === """{"other":1}""")
  }
}
