package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: replicates the driver's sf0.1 tables
  * R-fold into a target directory so the bench can be re-run at ~10x data
  * and per-query scaling ratios measured (the "would this plan survive a
  * 100x scale-up" question, answered empirically instead of by plan
  * inspection).
  *
  * Scaling model — a bigger corpus has MORE entities, not more copies of
  * the same entity:
  *   - tiny dimensions (`region`, `nation`) stay fixed, like real dims;
  *   - every fact/entity table gets R replicas with primary AND foreign
  *     keys shifted by a per-table stride, so per-replica FK joins still
  *     match and key cardinality grows linearly;
  *   - `documents.text` is letter-rotated per replica (a Caesar map over
  *     [a-zA-Z] via `translate`). Length, whitespace and punctuation are
  *     preserved — token/shingle counts and quality metrics cost the
  *     same — but cross-replica shingles share nothing, so near-dup
  *     self-joins see 10x distinct docs with the same planted-duplicate
  *     rate rather than 10 exact copies of each doc (which would
  *     quadratically inflate every LSH bucket — not what scale looks
  *     like);
  *   - `embeddings.embedding` is cyclically rotated by replica index:
  *     norms are preserved, cross-replica cosine decorrelates, and the
  *     per-replica neighborhood structure is intact.
  *
  * `events.ts` is normalized to a micros session-local TIMESTAMP on
  * write, whatever footer shape the source shipped with (nanos or
  * micros-NTZ — see [[Tables.events]]), so the scaled table round-trips
  * through [[Tables.events]]'s pass-through branch.
  */
object ScaleUp {

  /** Per-table key strides — larger than any source key so replica key
    * ranges never collide.
    */
  private val DIM_STRIDE = 1000000L   // customer/supplier/part keys
  private val FACT_STRIDE = 10000000L // orderkey / event_id

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, src, dst, replicas)
    spark.stop()
  }

  def writeAll(spark: SparkSession, src: String, dst: String, replicas: Int): Unit = {
    // transform uniqueness budget: embeddings wrap at 2×64 (rotate+negate),
    // text at 312 affine maps — past min(128, 312) replicas the generator
    // would silently plant byte-exact duplicate corpora, the pathological
    // workload the per-replica transforms exist to prevent
    require(replicas >= 1 && replicas <= 128,
      s"replicas must be in [1, 128] (transform uniqueness budget), got $replicas")
    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String)(df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    /** R replicas of `df`, transformed per replica index. */
    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(i => f(df, i)).reduce(_ unionByName _)

    def shift(df: DataFrame, i: Int, strides: (String, Long)*): DataFrame =
      strides.foldLeft(df) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + lit(i * stride))
      }

    // fixed dimensions
    write("region")(read("region"))
    write("nation")(read("nation"))

    write("customer")(replicate(read("customer"))(shift(_, _, "c_custkey" -> DIM_STRIDE)))
    write("supplier")(replicate(read("supplier"))(shift(_, _, "s_suppkey" -> DIM_STRIDE)))
    write("part")(replicate(read("part"))(shift(_, _, "p_partkey" -> DIM_STRIDE)))
    write("orders")(replicate(read("orders"))(
      shift(_, _, "o_orderkey" -> FACT_STRIDE, "o_custkey" -> DIM_STRIDE)))
    write("lineitem")(replicate(read("lineitem"))(
      shift(_, _, "l_orderkey" -> FACT_STRIDE, "l_partkey" -> DIM_STRIDE,
        "l_suppkey" -> DIM_STRIDE)))

    // events: the source ts footer has shipped as TIMESTAMP(NANOS)
    // (readable only as raw nanos) and micros-NTZ across driver refreshes;
    // normalize exactly as Tables.events does and write back a micros
    // TIMESTAMP — a type DuckDB reads directly
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evRaw = read("events")
    val evTs = evRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        evRaw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        evRaw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => evRaw
    }
    write("events")(replicate(evTs)(
      shift(_, _, "event_id" -> FACT_STRIDE, "user_id" -> DIM_STRIDE)))

    val letters = ('a' to 'z').mkString + ('A' to 'Z').mkString
    // Per-replica AFFINE letter permutation c → a·c + b (mod 26), a coprime
    // to 26: 12 multipliers × 26 offsets = 312 distinct bijections, so text
    // stays replica-unique well past the 26 replicas a plain rotation
    // supports (replicas 0 and 26 of a rotation would be EXACT copies —
    // a duplicated corpus, which quadratically inflates every dedup
    // bucket — not a bigger one). Replica 0 is the identity map (a=1,b=0),
    // so 10×/30× data generated by the earlier rotation stays comparable.
    val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    def affineAlpha(i: Int): String = {
      val a = coprimes((i / 26) % coprimes.size)
      val b = i % 26
      def m(idx: Int): Int = (a * idx + b) % 26
      val lo = (0 until 26).map(idx => ('a' + m(idx)).toChar).mkString
      val hi = (0 until 26).map(idx => ('A' + m(idx)).toChar).mkString
      lo + hi
    }
    write("documents")(replicate(read("documents")) { (df, i) =>
      shift(df, i, "doc_id" -> DIM_STRIDE)
        .withColumn("text", translate(col("text"), letters, affineAlpha(i)))
    })

    // cyclic rotation wraps at the embedding dimensionality (64): for the
    // second wrap, negate — norms preserved, cosine decorrelated (sign
    // flip), 2×dim distinct transforms cover ×100
    write("embeddings")(replicate(read("embeddings")) { (df, i) =>
      val dim = 64
      val r = i % dim
      val rotated =
        if (r == 0) col("embedding")
        else concat(expr(s"slice(embedding, ${r + 1}, size(embedding) - $r)"),
          expr(s"slice(embedding, 1, $r)"))
      val flipped =
        if ((i / dim) % 2 == 0) rotated
        else transform(rotated, x => -x)
      shift(df, i, "vec_id" -> DIM_STRIDE).withColumn("embedding", flipped)
    })
  }
}
