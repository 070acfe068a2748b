package graft

import org.apache.spark.sql.SparkSession

/** Purpose-built probe for the iterative graph operators: times
  * [[graft.operators.Rank.pageRank]] / [[graft.operators.Rank.hits]] as
  * a function of iteration count and prints the physical-plan exchange
  * census for one iteration step — the artifact behind the fixed-cost
  * adjudication in SCALING.md (is per-iteration cost data work or
  * framework stages?).
  */
object BenchIter {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_PARTS decouples the shuffle width from the thread
    // count, so a width A/B is not confounded by core oversubscription
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Rank

    val g = Rank.tradeGraph(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), 1000000L)
      .localCheckpoint()
    g.count() // warm

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[benchiter] $label%-28s ${runs.map(_._1).min}%8.2f s  (rows ${runs.head._2})")
    }

    // SPARK_GRAFT_ITER=peel: time the PEEL-family operators only (the
    // 10,000x-rehearsal width A/B) and exit
    if (sys.env.get("SPARK_GRAFT_ITER").contains("peel")) {
      time("kCoreChecked k=25 r=5") {
        graft.operators.Graph.kCoreChecked(g, 25, 5).count()
      }
      time("labelPropagation r=4") {
        graft.operators.Graph.labelPropagation(g, 4).count()
      }
      spark.stop()
      return
    }
    // SPARK_GRAFT_ITER=prjoin: interleaved A/B of the per-iteration join
    // strategy (shuffle-hash hint vs SMJ against the sorted cache) — 3
    // pairs, arms alternating inside ONE JVM so box drift hits both
    if (sys.env.get("SPARK_GRAFT_ITER").contains("prjoin")) {
      for (i <- 1 to 3) {
        time(s"pageRank it=6 SHJ  #$i") {
          Rank.pageRankImpl(g, 6, 0.85, useShj = true).count()
        }
        time(s"pageRank it=6 SMJ  #$i") {
          Rank.pageRankImpl(g, 6, 0.85, useShj = false).count()
        }
      }
      spark.stop()
      return
    }
    // SPARK_GRAFT_ITER=pr: time the registered-budget pageRank/HITS only
    // (the width A/B needs the 6-iteration points, not the decade sweep)
    if (sys.env.get("SPARK_GRAFT_ITER").contains("pr")) {
      // stage-level attribution: where do the per-iteration seconds go?
      // (the UI is disabled in bench runs; this is its one-shot stand-in)
      val stages = new scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long)]
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val m = i.taskMetrics
            stages.synchronized {
              stages += ((i.name.take(60),
                i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
                m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
            }
          }
        })
      // it=1 next to it=6 splits the fixed cost (graph build + caches)
      // from the per-iteration marginal cost: marginal = (t6 - t1) / 5
      time("pageRank it=1") { Rank.pageRank(g, 1).count() }
      stages.clear()
      time("pageRank it=6") { Rank.pageRank(g, 6).count() }
      println("[benchiter] pageRank it=6 stages (2 runs), by wall desc:")
      stages.synchronized {
        stages.sortBy(-_._2).take(24).foreach { case (n, ms, sr, sw) =>
          println(f"[benchiter]   ${ms / 1000.0}%7.2f s  read=${sr / 1e6}%8.1f MB  write=${sw / 1e6}%8.1f MB  $n")
        }
      }
      stages.clear()
      val e6 = Rank.tradeEdges(Tables.orders(spark, sfDir),
        Tables.lineitem(spark, sfDir), 1000000L).localCheckpoint()
      e6.count()
      time("hits it=6") { Rank.hits(e6, 6).count() }
      spark.stop()
      return
    }

    // 30-iteration point: with the per-iteration lazy localCheckpoint
    // the wall must stay linear in iterations (flat per-iteration cost);
    // pre-fix, plan analysis grew with the embedded prior plans
    for (it <- Seq(1, 2, 5, 10, 30))
      time(s"pageRank it=$it") { Rank.pageRank(g, it).count() }
    val e = Rank.tradeEdges(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), 1000000L)
      .localCheckpoint()
    e.count()
    for (it <- Seq(1, 2, 5, 10))
      time(s"hits it=$it") { Rank.hits(e, it).count() }

    println("[benchiter] one-step pageRank plan:")
    println(Rank.pageRank(g, 1).queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
