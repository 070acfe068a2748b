package graft.query

import graft.etl.Extensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `get_actions` request parameters — the surface of the reference's
  * `/v2/history/get_actions` (src/api/routes/v2-history/get_actions/).
  */
final case class GetActionsParams(
    account: Option[String] = None,
    filter: Option[String] = None,          // "code:name,code2:*"
    after: Option[String] = None,
    before: Option[String] = None,
    sort: Option[String] = None,            // asc|desc|1|-1
    sortedBy: Option[String] = None,        // "field:dir" override
    skip: Option[Int] = None,
    limit: Option[Int] = None,
    simple: Boolean = false,
    noBinary: Boolean = false,
    extras: Map[String, String] = Map.empty, // generic dotted-field filters
    checkLib: Boolean = false)

/** The ~40 endpoint functions of the reference, re-expressed as
  * params → DataFrame compilers over the history/state tables. Each stage
  * mirrors the reference's compile pipeline (get_actions.ts:16-47):
  * skip/limit → sort guard → account filters → generic filters → time
  * filter → code:action filters, then post-shaping.
  */
object Endpoints {

  /** GET /v2/history/get_actions — full pipeline over the actions table. */
  def getActions(actions: DataFrame, p: GetActionsParams): DataFrame = {
    val (skip, limit) = Paging.skipLimit(p.skip, p.limit)
    val asc = Paging.sortDir(p.sort)
    Paging.checkAscGuard(asc, p.after, p.before)

    val preds: Seq[Column] =
      p.account.map(FilterCompiler.accountExpansion).toSeq ++
        p.filter.map(FilterCompiler.codeActionFilters).toSeq ++
        FilterCompiler.timeFilter(p.after, p.before).toSeq ++
        p.extras.map { case (f, v) => FilterCompiler.genericFilter(f, v) }

    val filtered = preds.foldLeft(actions)((df, c) => df.filter(c))

    val sorted = p.sortedBy match {
      case Some(spec) =>
        val Array(f, dir) = spec.split(':').padTo(2, "desc")
        filtered.orderBy(if (dir == "asc") col(f).asc else col(f).desc)
      case None =>
        filtered.orderBy(
          if (asc) col("global_sequence").asc else col("global_sequence").desc)
    }

    val paged = sorted.offset(skip).limit(limit)
    // fold back whichever @-extension structs the frame carries (the full
    // lift family, not just @transfer) — mergeActionMeta semantics across
    // every handler output present
    val extCols = graft.etl.Lifts.actionExtCols.filter(paged.columns.contains)
    val shaped =
      if (p.simple) simpleProjection(paged)
      else Extensions.mergeActionMetaAll(paged, extCols)
    if (p.noBinary && !p.simple)
      shaped.withColumn("act",
        struct(col("act.account").as("account"), col("act.name").as("name"),
          col("act.authorization").as("authorization"),
          Extensions.noBinary(col("act.data")).as("data")))
    else shaped
  }

  /** `simple=true` output mode (P3, get_actions.ts:114-127): flat shape
    * with `actors` = "actor@permission,…" and distinct notified set.
    */
  def simpleProjection(actions: DataFrame): DataFrame =
    actions.select(
      col("block_num").as("block"),
      col("timestamp"),
      col("act.account").as("contract"),
      col("act.name").as("action"),
      array_join(transform(col("act.authorization"),
        a => concat(a.getField("actor"), lit("@"), a.getField("permission"))), ",")
        .as("actors"),
      array_distinct(col("notified")).as("notified"),
      col("trx_id").as("transaction_id"),
      col("act.data").as("data"))

  /** GET /v2/history/get_deltas — same compile pipeline over deltas. */
  def getDeltas(
      deltas: DataFrame,
      code: Option[String] = None,
      scope: Option[String] = None,
      table: Option[String] = None,
      payer: Option[String] = None,
      after: Option[String] = None,
      before: Option[String] = None,
      sort: Option[String] = None,
      skip: Option[Int] = None,
      limit: Option[Int] = None): DataFrame = {
    val (s, l) = Paging.skipLimit(skip, limit)
    val asc = Paging.sortDir(sort)
    val preds = Seq(
      code.map(FilterCompiler.multiVar("code", _)),
      scope.map(FilterCompiler.multiVar("scope", _)),
      table.map(FilterCompiler.multiVar("table", _)),
      payer.map(FilterCompiler.multiVar("payer", _)),
      FilterCompiler.timeFilter(after, before)).flatten
    preds.foldLeft(deltas)((df, c) => df.filter(c))
      .orderBy(if (asc) col("block_num").asc else col("block_num").desc)
      .offset(s).limit(l)
  }

  /** GET /v2/state/get_links (F13: live rows only). */
  def getLinks(links: DataFrame, account: Option[String]): DataFrame =
    account.map(a => links.filter(col("account") === a))
      .getOrElse(links)
      .filter(FilterCompiler.liveRowsOnly())
      .orderBy(col("block_num").desc)

  /** GET /v2/history/get_table_state — composite-agg pagination +
    * top_hits argmax (A10/A11): snapshot of a contract table at a block,
    * keyset-paged by "scope-primary_key".
    */
  def getTableState(
      deltas: DataFrame,
      code: String,
      table: String,
      atBlock: Long,
      afterKey: Option[String] = None,
      pageSize: Int = 25): DataFrame = {
    val base = deltas
      .filter(col("code") === code && col("table") === table &&
        col("block_num") <= atBlock)
      .withColumn("composite_key", concat(col("scope"), lit("-"), col("primary_key")))
    val keyed = afterKey.map(k => base.filter(col("composite_key") > k)).getOrElse(base)
    graft.operators.Latest.argmax(keyed, Seq("composite_key"), col("block_num"))
      .filter(col("present") =!= 0)
      .orderBy(col("composite_key"))
      .limit(pageSize)
  }

  /** GET /v2/stats/get_resource_usage (A6+A7). */
  def getResourceUsage(actions: DataFrame, code: String, action: String): DataFrame =
    actions
      .filter(col("act.account") === code && col("act.name") === action)
      .agg(
        count(lit(1)).as("cnt"),
        min(col("cpu_usage_us")).as("cpu_min"),
        max(col("cpu_usage_us")).as("cpu_max"),
        avg(col("cpu_usage_us")).as("cpu_avg"),
        expr("percentile(cpu_usage_us, array(0.01,0.05,0.25,0.5,0.75,0.95,0.99))")
          .as("cpu_percentiles"),
        min(col("net_usage_words")).as("net_min"),
        max(col("net_usage_words")).as("net_max"),
        avg(col("net_usage_words")).as("net_avg"))

  /** GET /v2/stats/get_action_usage (A5/A14): action count in a window by
    * monotonic-sequence difference + unique actors via HLL.
    */
  def getActionUsage(actions: DataFrame, fromTs: String, toTs: String): DataFrame =
    actions.agg(
      (max(when(col("timestamp") < to_timestamp(lit(toTs)), col("global_sequence")))
        - max(when(col("timestamp") < to_timestamp(lit(fromTs)), col("global_sequence"))))
        .as("action_count"),
      approx_count_distinct(
        when(col("timestamp").between(to_timestamp(lit(fromTs)), to_timestamp(lit(toTs))),
          element_at(col("act.authorization"), 1).getField("actor")))
        .as("unique_actors"))
}
