package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media asset (the stub decoder's output shape). */
final case class MediaFeatures(
    doc_id: Long,
    byte_len: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    content_hash: Long)

/** Multimodal column handling for training-data pipelines: media travels
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs as a partition-parallel typed pipeline (`mapPartitions` — the
  * Scala analog of `mapInPandas` batch UDFs: one iterator per partition,
  * amortized per-batch setup, no per-row driver involvement).
  *
  * The actual codec is STUBBED (image/audio libraries are not in this
  * container): `decodeStub` derives deterministic fake dimensions from
  * the payload length, clearly marked below. The Spark-side plumbing —
  * binary schema, metadata struct, partitioning, batch shape — is real
  * and is what the operator tests exercise.
  */
object Multimodal {

  /** Wrap any table into (id, content binary, meta struct) media shape. */
  def toMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        length(col(payloadCol)).cast("long").as("byte_len"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** ===== STUB DECODER =====
    * Deterministic fake of an image/video decode: dimensions and frame
    * count derived arithmetically from payload length; a real deployment
    * replaces the body with the actual codec call (per-partition init,
    * same signature). The formulas are mirrored by the SQL oracle.
    */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" happens here in a real decoder
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          MediaFeatures(
            doc_id = id,
            byte_len = n,
            width = ((n * 7) % 512 + 16).toInt,
            height = ((n * 13) % 512 + 16).toInt,
            n_frames = (n % 10 + 1).toInt,
            content_hash = bytes.foldLeft(1469598103934665603L)((h, b) =>
              (h ^ (b & 0xffL)) * 1099511628211L)) // FNV-1a 64
        }
      }
  }

  /** Frame sampling plan: every k-th frame index of each asset —
    * demonstrates the explode-shaped stage that follows decode in a real
    * video pipeline (one row per sampled frame).
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int)(
      implicit spark: SparkSession): DataFrame =
    features.toDF()
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))

  /** Resize stub: target box arithmetic (aspect-preserving fit), pure
    * column math — the real pixel work would live in the decode stage.
    */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0))
    features.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
