package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planted-skew rehearsal — the duplicate distribution the affine-
  * bijection ScaleUp corpora CANNOT produce (their replicas share no
  * literal shingles, so every banded join has only ever been measured on
  * clique-friendly key distributions):
  *
  *  1. `lsh`: [[graft.operators.Dedup.minhashLsh]] pair-exact vs
  *     `maxBucket`-capped on corpora with one planted duplicate clique —
  *     the pair-exact mode is measured on growing cliques until its
  *     O(c²) bucket explodes, the capped mode through 50k-document
  *     cliques where pair-exact is infeasible (a 50k clique is 1.25e9
  *     pairs before the first filter).
  *  2. `cc`: the [[graft.operators.Cluster.connectedComponents]] hot-key
  *     question — its large-star step takes a window min over the node
  *     partition, which ships every edge of a degree-d hub to ONE task;
  *     the salt-equivalent alternative (map-side-combined groupBy min +
  *     join back) is measured against it on star graphs of growing hub
  *     degree, answering "does the CC iteration need salting at planted
  *     -clique degrees" with numbers instead of a claim.
  *
  *  3. `embed`: [[graft.operators.Dedup.embeddingCosine]] pair-exact vs
  *     the production-default identical-vector group cap on corpora with
  *     one planted byte-identical embedding clique (mirror pages embed
  *     identically) — the pair-exact mode on growing cliques until its
  *     O(c²) bucket explodes, the capped mode through 50k-vector cliques.
  *
  * Prints one JSON line per measurement; knobs via env:
  * SPARK_GRAFT_SKEW_MODE=lsh|cc|embed|all (default all).
  */
object BenchSkew {

  /** Corpus with `nTail` distinct documents (40 id-derived pseudo-random
    * tokens each — no cross-document shingles) plus one `clique`-sized
    * block of VERBATIM copies of a fixed text. Narrow generation, no
    * files.
    */
  def plantedCorpus(spark: SparkSession, nTail: Long, clique: Long): DataFrame = {
    val tokens = (0 until 40).map(j =>
      substring(md5(concat(col("id").cast("string"), lit(s"_$j"))), 1, 6))
    val tail = spark.range(0L, nTail, 1L, 32)
      .select(col("id").as("doc_id"), concat_ws(" ", tokens: _*).as("text"))
    val cliqueText = (0 until 40).map(j => f"cliquetok$j%02d").mkString(" ")
    val dup = spark.range(0L, clique, 1L, 32)
      .select((col("id") + 10000000L).as("doc_id"), lit(cliqueText).as("text"))
    tail.unionByName(dup)
  }

  /** Embedding corpus: `nTail` distinct id-derived 64-dim vectors plus
    * one `clique`-sized block of BYTE-IDENTICAL copies of a fixed vector
    * (mirror pages embed identically). Narrow generation, no files.
    */
  def plantedEmbeddings(spark: SparkSession, nTail: Long, clique: Long): DataFrame = {
    // hash-drawn tail components: a sin(a*id + b*i) lattice is near-
    // periodic across ids and produced millions of incidental cos ≥ 0.9
    // tail pairs, burying the clique signal under background volume
    val tailVec = transform(sequence(lit(0), lit(63)),
      i => sin(xxhash64(concat_ws("_", col("id"), i)).cast("double")).cast("float"))
    val cliqueVec = transform(sequence(lit(0), lit(63)),
      i => sin(i.cast("double") * 13.0 + 1.0).cast("float"))
    val tail = spark.range(0L, nTail, 1L, 32)
      .select(col("id").as("vec_id"), tailVec.as("embedding"))
    val dup = spark.range(0L, clique, 1L, 32)
      .select((col("id") + 10000000L).as("vec_id"), cliqueVec.as("embedding"))
    tail.unionByName(dup)
  }

  /** Star graph: hub 0 connected to `degree` spokes (the shape a capped
    * LSH pass hands the clustering step for one big clique).
    */
  def starEdges(spark: SparkSession, degree: Long): DataFrame =
    spark.range(1L, degree + 1, 1L, 32)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One large-star round's hot aggregation, window form: min over the
    * node partition — every edge of the hub lands in one task's sort.
    */
  private def largeStarWindow(edges: DataFrame): Long = {
    val bidir = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
    val w = Window.partitionBy("u")
    bidir.withColumn("m", least(col("u"), min("v").over(w)))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .count()
  }

  /** The same round with a map-side-combined groupBy min + shuffle join
    * back — the "salted" form: partial aggregation collapses the hub's
    * edges per input partition BEFORE the exchange, so no task ever sees
    * the full degree; the join back relies on AQE's skew split.
    */
  private def largeStarGroupBy(edges: DataFrame): Long = {
    val bidir = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
    val mins = bidir.groupBy("u").agg(min("v").as("mv"))
    bidir.join(mins, "u")
      .withColumn("m", least(col("u"), col("mv")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val mode = sys.env.getOrElse("SPARK_GRAFT_SKEW_MODE", "all")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Cluster, Dedup}

    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)

    if (mode == "lsh" || mode == "all") {
      // warm-up
      Dedup.minhashLsh(plantedCorpus(spark, 1000, 100), "doc_id", "text",
        numHashes = 16, bands = 8, threshold = 0.5).count()
      // pair-exact on growing cliques: the quadratic curve
      for (c <- Seq(1000L, 2000L, 4000L, 8000L)) {
        val docs = plantedCorpus(spark, 20000L, c)
        val (n, t) = time(Dedup.minhashLsh(docs, "doc_id", "text",
          numHashes = 16, bands = 8, threshold = 0.5).count())
        println(s"""{"metric":"lsh_pair_exact","clique":$c,"tail":20000,"pairs":$n,"sec":${fmt(t)}}""")
      }
      // capped mode through cliques pair-exact cannot touch
      for (c <- Seq(1000L, 2000L, 4000L, 8000L, 20000L, 50000L)) {
        val docs = plantedCorpus(spark, 20000L, c)
        val (n, t) = time(Dedup.minhashLsh(docs, "doc_id", "text",
          numHashes = 16, bands = 8, threshold = 0.5, maxBucket = 64).count())
        println(s"""{"metric":"lsh_capped","clique":$c,"tail":20000,"pairs":$n,"sec":${fmt(t)}}""")
      }
      // and the full capped pipeline feeding clustering, one big point
      val docs = plantedCorpus(spark, 20000L, 50000L)
      val (nc, tc) = time {
        val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
          numHashes = 16, bands = 8, threshold = 0.5, maxBucket = 64)
        Cluster.connectedComponents(pairs).count()
      }
      println(s"""{"metric":"lsh_capped_cc","clique":50000,"tail":20000,"members":$nc,"sec":${fmt(tc)}}""")
    }

    if (mode == "embed" || mode == "all") {
      // warm both plans so neither mode's first point pays codegen
      Dedup.embeddingCosine(plantedEmbeddings(spark, 1000, 100), "vec_id",
        "embedding", threshold = 0.9, maxBucket = Int.MaxValue).count()
      Dedup.embeddingCosine(plantedEmbeddings(spark, 1000, 100), "vec_id",
        "embedding", threshold = 0.9).count()
      // pair-exact on growing identical-vector cliques: the quadratic curve
      for (c <- Seq(1000L, 2000L, 4000L, 8000L)) {
        val emb = plantedEmbeddings(spark, 20000L, c)
        val (n, t) = time(Dedup.embeddingCosine(emb, "vec_id", "embedding",
          threshold = 0.9, maxBucket = Int.MaxValue).count())
        println(s"""{"metric":"embed_pair_exact","clique":$c,"tail":20000,"pairs":$n,"sec":${fmt(t)}}""")
      }
      // the production DEFAULT cap through cliques pair-exact cannot touch
      for (c <- Seq(1000L, 2000L, 4000L, 8000L, 20000L, 50000L)) {
        val emb = plantedEmbeddings(spark, 20000L, c)
        val (n, t) = time(Dedup.embeddingCosine(emb, "vec_id", "embedding",
          threshold = 0.9).count())
        println(s"""{"metric":"embed_capped","clique":$c,"tail":20000,"pairs":$n,"sec":${fmt(t)}}""")
      }
    }

    if (mode == "cc" || mode == "all") {
      largeStarWindow(starEdges(spark, 10000L)) // warm-up
      for (d <- Seq(100000L, 1000000L, 4000000L)) {
        val edges = starEdges(spark, d)
        val (_, tw) = time(largeStarWindow(edges))
        val (_, tg) = time(largeStarGroupBy(edges))
        println(s"""{"metric":"cc_large_star","degree":$d,"window_sec":${fmt(tw)},"groupby_sec":${fmt(tg)}}""")
      }
      // end-to-end CC on a hub graph, the shipped implementation
      for (d <- Seq(100000L, 1000000L)) {
        val (_, t) = time(Cluster.connectedComponents(starEdges(spark, d)).count())
        println(s"""{"metric":"cc_full","degree":$d,"sec":${fmt(t)}}""")
      }
    }
    spark.stop()
  }
}
