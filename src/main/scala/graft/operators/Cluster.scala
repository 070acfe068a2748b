package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected-components clustering over near-duplicate pair sets — the
  * step that turns pairwise LSH/Jaccard output into dedup *clusters* so a
  * pipeline can keep one canonical document per group of transitive
  * duplicates (A~B, B~C ⇒ {A,B,C} even when A and C never collide).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * published shuffle-bounded CC method. Each round is two window
  * aggregations partitioned by node (ONE shuffle each, map-side partial
  * agg via the per-partition sort) and converges in O(log²·n) rounds;
  * in practice near-dup graphs are unions of small-diameter blobs and
  * fix in 2–4 rounds. No step ever materializes anything larger than
  * the (deduped) edge list, so the plan holds at 100 TB pair volumes —
  * unlike naive min-label propagation, whose round count is the graph
  * DIAMETER (a 10⁶-long chain of near-dups ⇒ 10⁶ shuffles).
  *
  * Per-round lineage is truncated with `localCheckpoint` — iterative
  * plans otherwise stack O(rounds) shuffles into one exponential-analysis
  * Catalyst tree.
  */
object Cluster {

  /** (id, cluster_id) for every node appearing in `pairs`, where
    * cluster_id = min node id of the connected component. Nodes absent
    * from `pairs` (singletons) are the caller's to union in — see
    * [[canonical]] for the full keep-one-per-cluster pipeline.
    *
    * @param pairs candidate-pair frame, e.g. [[Dedup.ngramJaccard]] or
    *              [[Dedup.embeddingCosine]] output
    * @param maxRounds safety bound; throws if not converged (a real
    *                  corpus converges in < 10 — non-convergence means
    *                  the input is not a sane pair set)
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxRounds: Int = 25): DataFrame = {
    requireIntegralIds(pairs, aCol, bCol)
    val w = Window.partitionBy("u")

    // orient big→small, drop self-loops and duplicates
    var edges = pairs
      .select(
        greatest(col(aCol), col(bCol)).cast("long").as("u"),
        least(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // large-star: over BIDIRECTIONAL neighborhoods, hook every neighbor
      // strictly larger than u onto m = min(N(u) ∪ {u}). No distinct here:
      // duplicate edges cannot change the small-star's window min, and the
      // round's output is canonicalized by small-star's distinct — one
      // shuffle saved per round.
      val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val large = bidir
        .withColumn("m", least(col("u"), min("v").over(w)))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))

      // small-star: edges are already (big, small); hook u and all its
      // small-side neighbors onto the minimum of the closed neighborhood
      val small = large
        .withColumn("m", least(col("u"), min("v").over(w)))
        .select(explode(array(
          struct(col("u"), col("m").as("v")),
          struct(col("v").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()

      // fixpoint ⇔ edge sets equal; compare (count, order-free checksum) —
      // two scalars to the driver, never the edges themselves. The
      // checksum sums 64-bit hashes as decimal(38,0): a LONG sum would
      // hit ANSI overflow within a handful of uniform hashes.
      val Array(sig0, sig1) = Array(edges, small).map { e =>
        e.agg(count(lit(1)),
          sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      }
      done = sig0 == sig1
      edges = small
      round += 1
    }
    require(done, s"connectedComponents did not converge in $maxRounds rounds")

    // star fixpoint: every non-root points at its component min; roots
    // (the mins themselves) carry no out-edge, so union them back in
    edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster_id")).distinct())
  }

  /** Keep-one-per-cluster: every document tagged with its cluster id
    * (itself when it has no near-dup), then one canonical survivor per
    * cluster — the longest text, ties to the smallest id. Returns
    * (idCol, cluster_id, cluster_size) for survivors only.
    *
    * The pair graph is ≪ corpus (only colliding docs appear), so the
    * membership join broadcasts; the survivor pick is one shuffle on
    * cluster_id with a WindowGroupLimit-able rank.
    */
  /** Node ids must be integral: a string id would cast('long') to NULL,
    * silently collapsing every singleton into one null-keyed cluster —
    * the whole corpus deduped to a single survivor. Fail loudly instead.
    */
  private[operators] def requireIntegralIds(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"cluster ids must be integral; column '$c' is ${df.schema(c).dataType} — " +
          "hash or zip non-numeric ids to longs first")
    }

  def canonical(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    requireIntegralIds(docs, idCol)
    val members = connectedComponents(pairs)
    val tagged = docs.join(
        broadcast(members.withColumnRenamed("id", idCol)), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol).cast("long")))
    val byPref = Window.partitionBy("cluster_id")
      .orderBy(length(col(textCol)).desc, col(idCol).asc)
    tagged
      .withColumn("rn", row_number().over(byPref))
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("cluster_id")))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
  }
}
