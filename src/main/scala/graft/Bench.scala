package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}. A warm-up action runs
  * first so per-query timings measure steady-state execution, not JVM /
  * codegen warm-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // degradation rehearsal: SPARK_GRAFT_NO_BROADCAST=1 disables BOTH the
    // static and the AQE broadcast thresholds, so every un-hinted join
    // runs its shuffle-join fallback — the path a model table takes when
    // a real corpus pushes it past broadcast size
    if (sys.env.get("SPARK_GRAFT_NO_BROADCAST").contains("1")) {
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      builder.config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Streaming failures surface on ASYNC threads whose stacks land in the
    // log unattributed (the r16 artifact tail carried a truncated
    // DAGScheduler stack no one could name). Name every streaming
    // termination-with-error in one line, tied to the in-flight query.
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          e.exception.foreach { msg =>
            Console.err.println(s"[bench] streaming query ${e.id} " +
              s"terminated with error: ${msg.linesIterator.take(2).mkString(" | ")}")
          }
      })

    // Warm-up: touch every table + exercise shuffle/codegen paths once.
    SparkEntry.queries.get("q1_agg").foreach(f => f(spark, sfDir).count())
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).count()
    }
    Tables.events(spark, sfDir).count()

    // Contention probe: a fixed CPU-bound job (hash-reduce over 50M longs,
    // 32 partitions) whose wall time is ~constant on an idle box. Run
    // before and after the query sweep; an inflated probe means the
    // machine was contended and the totals should be read accordingly
    // (past rounds recorded 1.5x totals from driver-side contention).
    def probe(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: summing 50M full-range hashes overflows Long
      // under ANSI mode
      spark.range(0, 50000000L, 1, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val probeStart = (1 to 3).map(_ => probe()).min

    // Memory-BANDWIDTH probe: the CPU probe above is compute-bound and
    // was measured blind to a cross-round machine-state drift that moved
    // memory-heavy queries 1.6-2x while it stayed flat (round 15,
    // BENCH_r15_drift_ab_100x.json). One thread streaming over 256 MB —
    // reported in GB/s so artifacts from different rounds/hosts are
    // comparable on the axis that actually moved.
    def bwProbe(): Double = {
      val n = 256 * 1024 * 1024 / 8
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = i.toLong; i += 1 }
      val t0 = System.nanoTime()
      var s = 0L
      var r = 0
      while (r < 4) {
        var j = 0
        while (j < n) { s ^= a(j); j += 1 }
        r += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (s == 42L) println("") // keep the reduction observable
      4.0 * n * 8 / dt / 1e9
    }
    val bwStart = (1 to 2).map(_ => bwProbe()).max

    // Allocation-stall probe: the r16 cross-round A/B caught a machine
    // state (reset by a reboot) that ran byte-identical queries 2-34x
    // slower — allocation-heavy iteratives hit hardest (q_kcore
    // 106.5 -> 7.1 s), streaming walks least — while BOTH existing
    // probes stayed flat: the signature of memory-fragmentation /
    // THP-compaction stalls, which tax page-granular heap growth and
    // leave sequential streaming intact. Time 16 short-lived 64 MB
    // allocations touched a page apart; report seconds so a stalled
    // box is directly visible next to the flat bw number.
    def allocProbe(): Double = {
      val t0 = System.nanoTime()
      var r = 0
      var sink = 0L
      while (r < 16) {
        val a = new Array[Long](8 * 1024 * 1024) // 64 MB
        var i = 0
        while (i < a.length) { a(i) = i.toLong; i += 512 } // one touch per 4K page
        sink ^= a(a.length - 1)
        r += 1
      }
      if (sink == 42L) println("") // keep the allocation observable
      (System.nanoTime() - t0) / 1e9
    }
    val allocStart = (1 to 2).map(_ => allocProbe()).min

    // dev loop: SPARK_GRAFT_ONLY=q_a,q_b restricts the sweep (the driver
    // never sets it, so recorded artifacts always cover every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // diagnostic-tier queries (equivalence witnesses for a registered
    // scale path) stay out of the recorded sweep unless explicitly
    // requested — the correctness gate still runs them at every scale
    val includeDiagnostics =
      sys.env.get("SPARK_GRAFT_DIAGNOSTICS").contains("1") || only.isDefined
    // Forcing mode. Default `.count()` is the driver's recorded convention
    // (kept for round-over-round comparability) — but count lets Catalyst
    // prune terminal projections, so narrow per-row queries (regex scrubs,
    // normalizations) time only their scan. SPARK_GRAFT_FORCE=noop writes
    // to the no-op sink instead: every output column is computed, no I/O —
    // use it for scaling measurements of projection-heavy operators.
    val force: org.apache.spark.sql.DataFrame => Unit =
      sys.env.get("SPARK_GRAFT_FORCE") match {
        case Some("noop") =>
          df => df.write.format("noop").mode("overwrite").save()
        case _ => df => df.count(): Unit
      }
    // A swept query that throws must be NAMED, not an anonymous stack in
    // the driver's captured tail (r16's BENCH artifact ended in a
    // truncated DAGScheduler stack nobody could attribute): record one
    // line per failure (query + exception class + message) and emit them
    // both to stderr immediately and into the full-timings sidecar.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def sweep(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .filter { case (name, _) =>
          includeDiagnostics || !SparkEntry.diagnosticOnly(name) }
        .map { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"bench:$name")
        // SPARK_GRAFT_TRACE=1: stderr start marker per query, so any
        // engine WARN in the captured log attributes to a query by
        // timestamp (the WindowExec single-partition attribution ask).
        // Off by default — the driver's recorded tails stay unchanged.
        if (sys.env.get("SPARK_GRAFT_TRACE").contains("1"))
          Console.err.println(s"[bench] start $name")
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir)) catch {
          case e: Throwable =>
            val line = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
            errors(name) = line
            Console.err.println(s"[bench] $name FAILED: $line")
        }
        spark.sparkContext.setJobDescription(null)
        name -> (System.nanoTime() - t0) / 1e9
      }
    val firstPass = sweep()
    // mid-sweep probe pair: the r16 driver artifact showed a 29% pass
    // disagreement with no way to tell WHICH pass ran degraded
    val probeMid = (1 to 3).map(_ => probe()).min
    val allocMid = (1 to 2).map(_ => allocProbe()).min
    // Contention self-defense: an idle box probes ~0.08-0.10 s; past rounds
    // recorded 1.5x-inflated totals when driver-side work overlapped the
    // sweep — and a clean START probe does not prove a clean sweep (round 6
    // probed 0.102 and still recorded contended values). Always run two
    // passes and report the per-query minimum (steady state) plus both
    // pass totals so the artifact is readable either way.
    val secondPass = sweep()
    val m2 = secondPass.toMap
    val results =
      firstPass.map { case (n, v) => n -> math.min(v, m2.getOrElse(n, v)) }
    // The driver captures only a tail of stdout before parsing the JSON
    // line — per-query detail is limited to the headline queries so the
    // whole line stays well under that window (r1's all-78 line was cut
    // off mid-line and recorded as parsed:null). `value` still totals
    // every registered query. Full per-query timings go to a file.
    val headline = Seq("q1_agg", "q_join_enrich", "q_date_histogram",
      "q_asof_join", "q_latest_per_key", "q_sessionize", "q_json_extract",
      "q_dedup_exact", "q_ngram_jaccard", "q_ann_cosine", "q_ann_ivf",
      "q_embed_neardup", "q_semdedup", "q_span_dedup", "q_lm_score",
      "q_tfidf_topk",
      // r17 verdict ask #3: the heavy tier was invisible per-query (all
      // 16 rows above are sub-2 s) — additions only, the line stays ~1 KB
      "q_stream_join", "q_kcore", "q_hits", "q_ppr_auto", "q_label_prop",
      "q_pagerank", "q_7z_ingest", "q_arrow_ingest", "q_stream_cardinality",
      "q_suffix_dedup_bounded")
    // a rename that orphans a headline name must fail loudly, not silently
    // drop its per-query entry from the bench line
    val orphaned = headline.filterNot(SparkEntry.queries.keySet)
    require(orphaned.isEmpty, s"headline names not in SparkEntry.queries: $orphaned")
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val byName = results.toMap
    val qs = headline.flatMap(n => byName.get(n).map(v => "\"" + n + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    val probeEnd = (1 to 3).map(_ => probe()).min
    val total = fmt(results.map(_._2).sum)
    val all = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // An idle box probes ~0.08-0.10 s; stamp the verdict so a contended
    // artifact is machine-detectable instead of a judge-side inference
    // (r13's headline run recorded 233.8 s with no flag — the 214.3 s
    // uncontended perquery twin was the number to trust).
    val contended = math.max(probeStart, probeEnd) > 0.2
    val passesInfo =
      s""","passes":2,"total_pass1":${fmt(firstPass.map(_._2).sum)},"total_pass2":${fmt(secondPass.map(_._2).sum)}"""
    val bwEnd = (1 to 2).map(_ => bwProbe()).max
    val allocEnd = (1 to 2).map(_ => allocProbe()).min
    // Allocation-stall verdict, the contended twin: the r16 cross-boot
    // A/B proved a machine state (memory-fragmentation/THP stalls) that
    // ran byte-identical allocation-heavy queries 2-34x slower while the
    // CPU and bandwidth probes sat flat. Healthy baseline on this host is
    // 0.17-0.19 s (BENCH_full_r16_*); the r16 driver artifact that
    // recorded a +15% wall probed 0.208/0.216. Threshold 0.2 s — stamp
    // the verdict so a stalled artifact is machine-detectable instead of
    // a judge-side inference.
    val allocStalled =
      Seq(allocStart, allocMid, allocEnd).max > 0.2
    // Escape control chars too (r17 ADVICE): AnalysisException messages
    // embed newlines/tabs (plan fragments); one unescaped \n would render
    // the sidecar invalid JSON and defeat the machine-detectable goal.
    def jstr(v: String): String = {
      val sb = new StringBuilder
      v.foreach {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + jstr(v) + "\""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total_${results.size}_queries","value":$total,"unit":"sec","queries":$qs,"probe_start_sec":${fmt(probeStart)},"probe_mid_sec":${fmt(probeMid)},"probe_end_sec":${fmt(probeEnd)},"bw_probe_start_gbs":${fmt(bwStart)},"bw_probe_end_gbs":${fmt(bwEnd)},"alloc_probe_start_sec":${fmt(allocStart)},"alloc_probe_mid_sec":${fmt(allocMid)},"alloc_probe_end_sec":${fmt(allocEnd)},"contended":$contended,"alloc_stalled":$allocStalled,"n_errors":${errors.size}$passesInfo,"sf":"$sfDir"}"""
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "/tmp/graft_bench_full.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        s"""{"total":$total,"contended":$contended,"alloc_stalled":$allocStalled,"errors":$errJson,"queries":$all,"sf":"$sfDir"}\n""".getBytes)
    } catch {
      case e: Throwable =>
        Console.err.println(s"[bench] could not write full timings to $fullPath: $e")
    }
    // Emit the machine line LAST, after executor shutdown, on its own
    // line and flushed — a mid-sweep exception stack interleaving stdout
    // must not be able to corrupt it (r13's tail recorded parsed:null).
    spark.stop()
    System.out.println()
    System.out.println(line)
    System.out.flush()
  }
}
