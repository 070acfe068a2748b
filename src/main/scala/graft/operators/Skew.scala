package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at 100 TB scale.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) covers sort-merge joins at runtime; these helpers cover
  * the cases AQE does not: skewed *aggregations* (a hot group key melting
  * one reducer) and broadcast-infeasible skewed joins where one side must
  * be salted and the other replicated.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial-aggregates
    * hot keys across `salts` reducers, then a second tiny aggregation
    * merges the partials. Use for algebraic aggregates (sum/count/min/
    * max) on keys with pathological frequency; costs one extra (cheap)
    * shuffle over `salts × distinct-keys` rows.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[(String, String, String)], // (input col, fn ∈ sum|count|min|max, output name)
      salts: Int = 32): DataFrame = {
    require(aggs.nonEmpty && aggs.forall(a => Set("sum", "count", "min", "max")(a._2)))
    def fn(name: String)(c: Column): Column = name match {
      case "sum" => sum(c); case "count" => count(c)
      case "min" => min(c); case "max" => max(c)
    }
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        fn(aggs.head._2)(col(aggs.head._1)).as(aggs.head._3),
        aggs.tail.map(a => fn(a._2)(col(a._1)).as(a._3)): _*)
    // merge: sum/count re-sum, min/max re-min/max
    def mergeFn(a: (String, String, String)): Column = a._2 match {
      case "sum" | "count" => sum(col(a._3)).as(a._3)
      case "min" => min(col(a._3)).as(a._3)
      case "max" => max(col(a._3)).as(a._3)
    }
    partial.groupBy(keys.map(col): _*)
      .agg(mergeFn(aggs.head), aggs.tail.map(mergeFn): _*)
  }

  /** Salted join for a skewed fact against a non-broadcastable dim: the
    * fact side gets a random salt in [0, salts); the dim side is
    * replicated `salts` times with every salt value; the join key becomes
    * (key, salt), spreading each hot key over `salts` reducers. Row
    * multiplication is dim × salts — use only when dim ≪ fact but above
    * the broadcast threshold.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Frequency probe: top-N heaviest keys with their share — the decision
    * input for "broadcast vs salt vs AQE". Cheap (single agg), run it on
    * a sample at scale: `df.sample(0.01)`.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(total))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
