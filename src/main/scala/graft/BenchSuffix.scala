package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the suffix-array dedup path: build-only,
  * pairing+LCP, and rollup, at SPARK_GRAFT_SF_DIR. One JSON line.
  */
object BenchSuffix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import graft.operators.SuffixArray
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"), col("text"))
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // SPARK_GRAFT_SUFFIX_BOUNDED=1: stage-decompose the BOUNDED layout
    // instead (positions generation / +range sort / full op+rollup) —
    // the 4th-rehearsal-decade wall lives here, not in the unbounded
    // diagnostics
    if (sys.env.get("SPARK_GRAFT_SUFFIX_BOUNDED").contains("1")) {
      import spark.implicits._
      val cap = 40
      val (_, tGen) = t {
        docs.select(col("doc_id").cast("long").as("doc"), col("text").as("__t"))
          .as[(Long, String)].flatMap { case (doc, tx) =>
            val n = if (tx == null) 0 else tx.length
            (0 until n).iterator.map(p =>
              (doc, p, tx.substring(p, math.min(p + cap, n))))
          }.toDF("doc", "pos", "pfx")
          .write.format("noop").mode("overwrite").save()
      }
      val parts = sys.env.get("SPARK_GRAFT_SUFFIX_PARTS").map(_.toInt).getOrElse(0)
      val (_, tSorted) = t {
        val p = docs.select(col("doc_id").cast("long").as("doc"), col("text").as("__t"))
          .as[(Long, String)].flatMap { case (doc, tx) =>
            val n = if (tx == null) 0 else tx.length
            (0 until n).iterator.map(p =>
              (doc, p, tx.substring(p, math.min(p + cap, n))))
          }.toDF("doc", "pos", "pfx")
          .repartitionByRange(if (parts > 0) parts else 78,
            col("pfx"), col("doc"), col("pos"))
          .sortWithinPartitions("pfx", "doc", "pos")
        p.write.format("noop").mode("overwrite").save()
      }
      val (_, tOp) = t {
        SuffixArray.boundedRepeatLengths(docs, "doc_id", "text", cap = cap,
          nPart = parts).count()
      }
      println(s"""{"metric":"suffix_bounded_stages","gen_sec":$tGen,""" +
        s""""gen_sort_sec":$tSorted,"op_sec":$tOp,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    val (_, tBuildOrder) = t {
      val sa = SuffixArray.build(docs, "doc_id", "text")
      sa.order.count() // materialize the full doubling chain
    }
    val (_, tFull) = t {
      SuffixArray.repeatLengths(docs, "doc_id", "text").count()
    }
    val (_, tPairs) = t {
      val sa = SuffixArray.build(docs, "doc_id", "text")
      val (pairs, h) = SuffixArray.adjacentLcp(sa, docs, "doc_id", "text")
      pairs.count()
      h.unpersist()
    }
    println(s"""{"metric":"suffix_stages","build_order_sec":$tBuildOrder,""" +
      s""""pairs_lcp_sec":$tPairs,"full_sec":$tFull,"sf":"$sfDir"}""")
    spark.stop()
  }
}
