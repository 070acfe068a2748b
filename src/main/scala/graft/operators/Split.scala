package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training-data
  * pipelines. Both operators key on a cryptographic digest of the row id
  * rather than `rand()`: the assignment is then reproducible across runs,
  * stable under repartitioning, immune to input order, and — because md5
  * is a standard — reproducible by ANY engine (the DuckDB oracle included),
  * which is what makes a train/test split auditable.
  */
object Split {

  /** Hash bucket in [0, 100): first 8 hex chars of md5(id) as an integer,
    * mod 100. Pure codegen'd column arithmetic, zero shuffle.
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Adds a `split` label column from percentage weights, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. Weights must sum
    * to 100. The split is a narrow projection — at 100 TB it costs one
    * pass with no shuffle, and rows keep their label forever (adding
    * data never reassigns existing rows across splits).
    */
  def assign(df: DataFrame, idCol: String, weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = hashBucket(col(idCol))
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val label = weights.zip(bounds).tail
      .foldLeft(when(bucket < bounds.head, lit(weights.head._1))) {
        case (acc, ((name, _), hi)) => acc.when(bucket < hi, lit(name))
      }
    df.withColumn("split", label)
  }

  /** Exact stratified sample: per stratum, keep `ceil(frac · n)` rows,
    * chosen by md5-rank (deterministic, uniform, engine-reproducible).
    * One shuffle on the stratum key; the rank and the stratum count ride
    * the same window partition. Strata are typically language/source
    * labels — bounded cardinality, so skew salting is not needed; for a
    * shuffle-free approximate variant at extreme scale, filter on
    * [[hashBucket]] < frac·100 instead.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      frac: Double): DataFrame = {
    val w = Window.partitionBy(strataCol)
    val byHash = w.orderBy(md5(col(idCol).cast("string").cast("binary")).asc,
      col(idCol).asc)
    df.withColumn("__rn", row_number().over(byHash))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__rn", "__n")
  }
}
