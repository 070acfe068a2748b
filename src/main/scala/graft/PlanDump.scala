package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named registry queries
  * (the source of PLANS.md excerpts).
  *
  * Usage: runMain graft.PlanDump <sfDir> <query>[,<query>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q1_agg")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n")
      n match {
        // the registry queries checkpoint per round (bounded lineage by
        // design), which truncates explain to the final sort — these
        // synthetic cases rebuild ONE round un-checkpointed so the
        // per-round exchange shape is visible
        case "pagerank_round" | "pagerank_round_r16" =>
          // ONE power-iteration, un-checkpointed, against the SAME cached
          // edgesDeg build pageRank uses — shows whether the per-iteration
          // edge⋈rank join re-exchanges the cached edge list.
          import org.apache.spark.sql.functions._
          import org.apache.spark.storage.StorageLevel
          val edges = operators.Rank.tradeGraph(
            Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), 1000000L)
          val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          val joined0 = edges.join(deg, "src")
          val edgesDeg =
            (if (n == "pagerank_round_r16") joined0 // the round-16 unpartitioned cache
             else operators.Rank.partitionEdges(joined0, "src"))
              .persist(StorageLevel.MEMORY_AND_DISK)
          val nodes = edgesDeg.select(col("src").as("node")).distinct()
          nodes.count() // materialize the cache, as pageRank's node count does,
          // so the explain reflects the partitioning iterations actually see
          val ranks = nodes.select(col("node"), lit(100L).as("pr_e8"))
          edgesDeg
            .join(ranks.hint("shuffle_hash"), edgesDeg("src") === ranks("node"))
            .select(col("dst"),
              round(col("pr_e8") / col("deg")).cast("long").as("contrib_e8"))
            .groupBy("dst")
            .agg(sum(col("contrib_e8")).as("in_e8"))
            .explain("formatted")
        case "ppr_round" | "ppr_round_r16" =>
          // ONE forward-push round, un-checkpointed, so the per-round
          // exchange shape is visible. "ppr_round_r16" rebuilds the
          // round-16 aggregate (groupBy dst, dst_deg) whose hash(dst,
          // dst_deg) partitioning cannot serve the full_outer join on
          // node; "ppr_round" is the shipped groupBy(dst) shape.
          import org.apache.spark.sql.functions._
          val edges = operators.Rank.tradeGraph(
            Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), 1000000L)
          val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          val e2 = edges.join(deg, "src")
            .join(deg.select(col("src").as("dst"), col("deg").as("dst_deg")), "dst")
          val state = Tables.orders(spark, sfDir)
            .select(col("o_custkey").as("node")).filter(col("node") < 5)
            .distinct()
            .join(deg.select(col("src").as("node"), col("deg")), "node")
            .select(col("node"), col("deg"), lit(0L).as("p_e8"),
              lit(100000000L).as("r_e8"))
          val active = state.filter(col("r_e8") >= lit(1000L) * col("deg"))
            .select(col("node"), col("r_e8"))
          val contrib = e2
            .join(broadcast(active), e2("src") === active("node"))
            .select(col("dst"), col("dst_deg"),
              round(lit(0.85) * col("r_e8") / e2("deg")).cast("long").as("c_e8"))
          val pushed =
            if (n == "ppr_round_r16")
              contrib.groupBy("dst", "dst_deg")
                .agg(sum(col("c_e8")).as("in_e8"))
                .select(col("dst").as("node"), col("dst_deg").as("deg"), col("in_e8"))
            else
              contrib.groupBy("dst")
                .agg(sum(col("c_e8")).as("in_e8"), max(col("dst_deg")).as("dst_deg"))
                .select(col("dst").as("node"), col("dst_deg").as("deg"), col("in_e8"))
          val settled = state.select(col("node"), col("deg"),
            col("p_e8"), col("r_e8"))
          settled.as("s")
            .join(pushed.as("g"), col("s.node") === col("g.node"), "full_outer")
            .select(
              coalesce(col("s.node"), col("g.node")).as("node"),
              coalesce(col("s.deg"), col("g.deg")).as("deg"),
              coalesce(col("s.p_e8"), lit(0L)).as("p_e8"),
              (coalesce(col("s.r_e8"), lit(0L)) +
                coalesce(col("g.in_e8"), lit(0L))).as("r_e8"))
            .explain("formatted")
        case "kcore_round" =>
          import org.apache.spark.sql.functions._
          val edges = operators.Rank.tradeGraph(
            Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), 1000000L)
          val deg = edges.groupBy(col("src").as("node"))
            .agg(count(lit(1)).as("deg"))
          val alive = deg.filter(col("deg") >= 25).select("node")
          edges
            .join(alive.select(col("node").as("src")), "src")
            .join(alive.select(col("node").as("dst")), "dst")
            .groupBy(col("src").as("node"))
            .agg(count(lit(1)).as("deg"))
            .explain("formatted")
        case _ =>
          SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
