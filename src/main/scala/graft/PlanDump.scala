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
