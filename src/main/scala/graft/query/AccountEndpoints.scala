package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Account/transaction/block endpoint family (J2/J4, get_transaction,
  * get_blocks) — the reference's fan-out pages and id lookups.
  */
object AccountEndpoints {

  /** GET /v2/state/get_account (J4): the reference fires get_actions +
    * get_tokens + get_links concurrently and merges into one response.
    * Engine-side: three independent sub-plans (no shuffle joins between
    * them) collected into one single-row response frame via scalar
    * aggregation — Spark runs the three subtrees in parallel stages.
    */
  def getAccount(
      actions: DataFrame,
      balances: DataFrame,
      precisions: DataFrame,
      links: DataFrame,
      account: String,
      recentActions: Int = 10): DataFrame = {
    val acts = Endpoints.getActions(actions, GetActionsParams(
        account = Some(account), limit = Some(recentActions), simple = true))
      .agg(collect_list(struct(col("block"), col("action"), col("transaction_id")))
        .as("recent_actions"))
    val toks = StateEndpoints.getTokens(balances, precisions, account)
      .agg(collect_list(struct(col("symbol"), col("amount"), col("precision")))
        .as("tokens"))
    val lks = Endpoints.getLinks(links, Some(account))
      .agg(collect_list(struct(col("code"), col("action"), col("permission")))
        .as("links"))
    acts.crossJoin(toks).crossJoin(lks)
      .withColumn("account", lit(account))
      .select(col("account"), col("recent_actions"), col("tokens"), col("links"))
  }

  /** GET /v2/history/get_transaction (J2): all actions of a trx_id merged
    * with a 1-row chain-state frame (last irreversible block) — the
    * reference's parallel get_info + ES search collapse into a scalar
    * cross join; with a block-bucket hint the scan prunes to one
    * partition (the reference's `block_hint`).
    */
  def getTransaction(
      actions: DataFrame,
      trxId: String,
      lib: Long,
      blockHint: Option[Long] = None,
      partitionSize: Long = 1000000L): DataFrame = {
    val normalized = lower(lit(trxId))
    val base = blockHint match {
      case Some(b) =>
        // partition-pruning predicate, mirrors hot/hinted index selection
        val bucket = b / partitionSize
        actions.filter(col("block_num").between(bucket * partitionSize,
          (bucket + 1) * partitionSize - 1))
      case None => actions
    }
    val libFrame = base.sparkSession.range(1)
      .select(lit(lib).as("last_irreversible_block"))
    base.filter(lower(col("trx_id")) === normalized)
      .crossJoin(broadcast(libFrame))
      .withColumn("irreversible", col("block_num") <= col("last_irreversible_block"))
      .orderBy(col("global_sequence"))
  }

  /** GET /v2/history/get_blocks — term/terms/range filters over block
    * headers (F2/F5 on the blocks table).
    */
  def getBlocks(
      blocks: DataFrame,
      producer: Option[String] = None,
      after: Option[String] = None,
      before: Option[String] = None,
      sort: Option[String] = None,
      limit: Option[Int] = None): DataFrame = {
    val asc = Paging.sortDir(sort)
    val preds = Seq(
      producer.map(FilterCompiler.multiVar("producer", _)),
      FilterCompiler.timeFilter(after, before)).flatten
    preds.foldLeft(blocks)((df, c) => df.filter(c))
      .orderBy(if (asc) col("block_num").asc else col("block_num").desc)
      .limit(Paging.skipLimit(None, limit)._2)
  }
}
