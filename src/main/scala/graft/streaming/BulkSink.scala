package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Elasticsearch-shaped [[StateSink]]: renders each micro-batch to the ES
  * `_bulk` wire protocol and applies it to an embedded bulk endpoint.
  *
  * This is the in-repo implementation of the mapping documented on the
  * [[StateSink]] trait (reference: the ES bulk router,
  * src/indexer/helpers/elastic-routes.ts:54-140):
  *
  *   - `_id` = the natural key columns joined with `-`
  *     (buildTableProposalsBulk / buildDynamicTableBulk id scheme);
  *   - `present == 0` rows → `{"delete": {"_id": id}}` (makeDelOp);
  *   - everything else → a scripted upsert pair
  *     `{"update": {"_id": id, "retry_on_conflict": n}}` +
  *     `{"script": {"id": "updateByBlock", "params": row}, "scripted_upsert":
  *     true, "upsert": {}}` (makeScriptedOp), where the `updateByBlock`
  *     guard applies the params only when `params.block_num >=` the stored
  *     doc's (updateByBlock.painless.ts:3-30) — which is exactly
  *     [[graft.state.StateMerge]]'s last-writer-wins rule, so replays and
  *     crash-redeliveries are idempotent.
  *
  * The wire NDJSON is rendered DISTRIBUTIVELY (one `to_json` pass, no
  * driver materialization), persisted under `dir/bulk/batch-NNNNN/` for
  * inspection/re-hydration, and posted per partition to the embedded
  * index — the exact seam where a production deployment would POST to a
  * real cluster's `_bulk` endpoint instead. `read` serves the live index
  * back as a DataFrame under the first batch's schema (persisted to
  * `dir/schema.json` so a fresh JVM can still read).
  */
final class BulkStateSink(
    dir: String,
    val keys: Seq[String],
    blockCol: String = "block_num",
    presentCol: String = "present",
    retryOnConflict: Int = 3,
    strictDeletes: Boolean = false) extends StateSink {
  import org.apache.hadoop.fs.Path

  def mergeBatch(batch: DataFrame)(implicit spark: SparkSession): Unit = {
    persistSchemaOnce(batch.schema)
    EmbeddedBulkIndex.rehydrateIfCold(dir)
    // one row → one string holding the row's complete bulk op (action line,
    // and for upserts the script line too, '\n'-separated INSIDE the value):
    // rendering both lines of an op into a single value keeps the
    // action/source pairing atomic across partitions and file splits.
    //
    // CONTRACT NOTE — deletes carry the tombstone's block as an EXTERNAL
    // VERSION (`"version": block_num, "version_type": "external_gte"` —
    // real ES wire fields; makeDelOp itself sends a bare delete and relies
    // on per-key monotone blocks). Within a batch the per-key block
    // ordering below sequences ops correctly either way; ACROSS batches
    // the version guard closes the one divergence window a bare delete
    // has: a tombstone delivered a batch late (per-key block_num
    // regressing batch-over-batch) would unconditionally delete newer
    // state where [[graft.state.StateMerge]]'s LWW keeps it. The embedded
    // index skips-and-logs such regressing deletes (external_gte: apply
    // only when version >= stored block — ties delete, matching
    // StateMerge's batch-beats-state-at-equal-block rule), or fails the
    // batch when `strictDeletes` is set.
    val id = concat_ws("-", keys.map(col): _*)
    val action = when(col(presentCol) === 0,
      to_json(struct(struct(
        col("__id").as("_id"),
        col(blockCol).cast("long").as("version"),
        lit("external_gte").as("version_type")).as("delete"))))
      .otherwise(to_json(struct(struct(
        col("__id").as("_id"),
        lit(retryOnConflict).as("retry_on_conflict")).as("update"))))
    val script = when(col(presentCol) === 0, lit(null).cast("string"))
      .otherwise(to_json(struct(
        struct(lit("updateByBlock").as("id"),
          struct(batch.columns.map(col): _*).as("params")).as("script"),
        lit(true).as("scripted_upsert"),
        struct().as("upsert"))))
    // route by _id and order by block WITHIN each key: deletes are
    // unconditional in the bulk protocol, so a key's ops must apply as one
    // ordered stream — exactly the reference's per-key queue routing
    // (routerFunc in elastic-routes.ts). Without this, a concurrent
    // partition could apply delete(block b) after update(block b+n) and
    // drop a live row. The persisted log keeps the same layout so a
    // sequential replay reproduces the order.
    val ops = batch.withColumn("__id", id)
      .repartition(col("__id"))
      .sortWithinPartitions(col("__id"), col(blockCol))
      .select(concat_ws("\n", action, script).as("op"))
      // ONE materialization feeds both the wire log and the live apply:
      // without the persist, the write and the foreachPartition would each
      // re-run the shuffle+sort+render — double cost, and (key, block)
      // ties could order differently between the two runs, letting the
      // replayed log diverge from the live index after a restart
      .persist()
    try {
      ops.write.mode("overwrite").text(nextBatchDir(spark))
      // post per partition from the SAME keyed layout — in local mode the
      // embedded index is in-JVM; on a cluster this closure is where the
      // HTTP POST to _bulk would go
      val target = dir
      val strict = strictDeletes
      ops.foreachPartition {
        rows: Iterator[org.apache.spark.sql.Row] =>
          EmbeddedBulkIndex.post(target, rows.map(_.getString(0)), strict)
      }
    } finally ops.unpersist()
  }

  def read(implicit spark: SparkSession): DataFrame = {
    EmbeddedBulkIndex.rehydrateIfCold(dir)
    val docs = EmbeddedBulkIndex.docs(dir)
    val schema = readSchema(spark)
    import spark.implicits._
    spark.read.schema(schema).json(docs.toDS())
  }

  private def persistSchemaOnce(schema: StructType)(
      implicit spark: SparkSession): Unit = {
    val p = new Path(dir, "schema.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    }
  }

  private def readSchema(spark: SparkSession): StructType = {
    val p = new Path(dir, "schema.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no schema at $p — sink never received a batch")
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
  }

  private def nextBatchDir(spark: SparkSession): String = {
    val bulk = new Path(dir, "bulk")
    val fs = bulk.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = if (fs.exists(bulk))
      fs.listStatus(bulk).count(_.getPath.getName.startsWith("batch-"))
    else 0
    new Path(bulk, f"batch-$n%05d").toString
  }
}

/** Embedded stand-in for an Elasticsearch `_bulk` endpoint: parses NDJSON
  * op streams and applies them to an in-JVM document index with ES's
  * concurrency model — per-doc sequence numbers, optimistic compare-and-
  * swap, and `retry_on_conflict` retries before an op fails. One index per
  * sink directory (the "cluster address"), so concurrent partition writers
  * of one sink contend on the same docs, exactly like concurrent bulk
  * clients against one ES index.
  *
  * Supported ops (the three the reference's routers emit):
  *   - `update` + scripted-upsert source line: apply `updateByBlock`
  *     semantics — insert if absent; if present, apply params only when
  *     `params.block_num >= doc.block_num`; null params remove fields;
  *   - `delete`: unconditional remove;
  *   - `index` + source line: unconditional replace (abi/action/block
  *     routes).
  *
  * Restart story: the index is memory-only, but every batch's wire NDJSON
  * is persisted by [[BulkStateSink]]; `rehydrateIfCold` replays the logged
  * batches in order, so a fresh JVM serves the same state (the embedded
  * analogue of ES's translog replay).
  */
object EmbeddedBulkIndex {

  /** doc = parsed JSON object; seqNo drives the CAS. */
  private final case class Entry(seqNo: Long, doc: JObject)
  private val indexes =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Entry]]()

  private def index(target: String) =
    indexes.computeIfAbsent(target, _ => new ConcurrentHashMap[String, Entry]())

  /** Apply one NDJSON op stream (the body an HTTP client would POST to
    * `_bulk`). Lines pair up action→source exactly as in the wire
    * protocol. Throws if any op exhausts its conflict retries — a real
    * bulk response would report per-item 409s; the sink treats any as
    * batch failure so Structured Streaming redelivers.
    */
  def post(target: String, lines: Iterator[String],
      strictDeletes: Boolean = false): Unit = {
    val idx = index(target)
    // accept both physical lines and multi-line op strings (an update op
    // is an action line + a source line)
    val it = lines.flatMap(_.split('\n')).filter(_.nonEmpty)
    while (it.hasNext) {
      val action = JsonMethods.parse(it.next()).asInstanceOf[JObject]
      action.obj.head match {
        case ("delete", meta) =>
          val version = (meta \ "version") match {
            case JInt(n) => Some(n.toLong)
            case JLong(n) => Some(n)
            case _ => None // bare delete: unconditional, wire-compatible
          }
          deleteVersioned(idx, idString(meta), version, strictDeletes, target)
        case ("update", meta) =>
          val source = JsonMethods.parse(it.next()).asInstanceOf[JObject]
          val params = (source \ "script" \ "params").asInstanceOf[JObject]
          val retries = (meta \ "retry_on_conflict") match {
            case JInt(n) => n.toInt
            case _ => 0
          }
          casLoop(idx, idString(meta), retries) { prev =>
            applyUpdateByBlock(prev, params)
          }
        case ("index", meta) =>
          val source = JsonMethods.parse(it.next()).asInstanceOf[JObject]
          casLoop(idx, idString(meta), 0) { _ => Some(source) }
        case (op, _) =>
          throw new IllegalArgumentException(s"unsupported bulk op: $op")
      }
    }
  }

  /** Current docs of a target as JSON lines (test/read-path use). */
  def docs(target: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    index(target).values().asScala.toSeq
      .map(e => JsonMethods.compact(JsonMethods.render(e.doc)))
  }

  /** Drop an index (test isolation). */
  def drop(target: String): Unit = indexes.remove(target)

  /** Replay the persisted bulk log if this JVM has no live index for the
    * target (fresh process serving an existing sink directory).
    */
  def rehydrateIfCold(target: String): Unit = synchronized {
    if (!indexes.containsKey(target)) {
      // list and read through the Hadoop FileSystem API — the sink WRITES
      // through it, so a non-local dir (hdfs://, s3a://) must rehydrate
      // from the same namespace, not silently see an empty java.io path.
      // Use the session's hadoopConfiguration: spark.hadoop.* settings
      // (credentials, endpoints, defaultFS) never reach a bare
      // `new Configuration()`, which would resolve the path in the wrong
      // namespace and silently rehydrate empty state
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val bulk = new org.apache.hadoop.fs.Path(target, "bulk")
      val fs = bulk.getFileSystem(conf)
      index(target) // mark warm even if the log is empty
      if (fs.exists(bulk)) {
        fs.listStatus(bulk)
          .filter(_.getPath.getName.startsWith("batch-"))
          .sortBy(_.getPath.getName)
          .foreach { b =>
            fs.listStatus(b.getPath)
              .filter(_.getPath.getName.startsWith("part-"))
              .sortBy(_.getPath.getName)
              .foreach { f =>
                val in = fs.open(f.getPath)
                val src = scala.io.Source.fromInputStream(in, "UTF-8")
                try post(target, src.getLines()) finally src.close()
              }
          }
      }
    }
  }

  private def idString(meta: JValue): String = (meta \ "_id") match {
    case JString(s) => s
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  /** Optimistic apply: read the entry, compute, CAS on the seqNo; retry on
    * concurrent modification up to `retries` times (ES retry_on_conflict).
    * `f` returns None for a no-op (guard rejected the update).
    */
  private def casLoop(
      idx: ConcurrentHashMap[String, Entry],
      id: String,
      retries: Int)(f: Option[JObject] => Option[JObject]): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      val prev = Option(idx.get(id))
      f(prev.map(_.doc)) match {
        case None => done = true
        case Some(next) =>
          val nextEntry = Entry(prev.map(_.seqNo + 1).getOrElse(0L), next)
          done = prev match {
            case None => idx.putIfAbsent(id, nextEntry) == null
            case Some(p) => idx.replace(id, p, nextEntry)
          }
          if (!done) {
            attempt += 1
            if (attempt > retries) throw new IllegalStateException(
              s"version conflict on _id=$id after $retries retries")
          }
      }
    }
  }

  /** ES external_gte delete: apply only when the op's version (the
    * tombstone's block_num) is >= the stored doc's — ties delete,
    * matching [[graft.state.StateMerge]]'s batch-beats-state rule. A
    * REGRESSING delete (stored block newer than the tombstone) is the
    * late-delivery divergence the round-8 contract note documented:
    * skip it (log) so LWW state survives exactly as the parquet sink
    * keeps it, or throw under `strict` so Structured Streaming surfaces
    * the ordering violation as a batch failure. Conditional remove
    * (CHM.remove(key, value)) keeps the read-check-remove atomic against
    * concurrent partition writers.
    */
  private def deleteVersioned(
      idx: ConcurrentHashMap[String, Entry],
      id: String,
      version: Option[Long],
      strict: Boolean,
      target: String): Unit = {
    var done = false
    while (!done) {
      val prev = idx.get(id)
      if (prev == null) done = true // absent doc: delete is a no-op
      else {
        val regressing = version.exists(v =>
          blockOf(prev.doc).exists(_ > BigInt(v)))
        if (regressing) {
          val msg = s"regressing delete on _id=$id at $target: delete " +
            s"version ${version.get} < stored block ${blockOf(prev.doc).get} " +
            "— late tombstone, newer state kept (LWW)"
          if (strict) throw new IllegalStateException(msg)
          Console.err.println(s"[bulk-sink] $msg")
          done = true
        } else done = idx.remove(id, prev)
      }
    }
  }

  private def blockOf(o: JObject): Option[BigInt] = (o \ "block_num") match {
    case JInt(n) => Some(n)
    case JLong(n) => Some(BigInt(n))
    case _ => None
  }

  /** The updateByBlock script (updateByBlock.painless.ts:3-30): apply
    * params unless the stored doc has a NEWER block_num; null-valued
    * params remove fields.
    */
  private def applyUpdateByBlock(
      prev: Option[JObject], params: JObject): Option[JObject] = {
    val stale = (for {p <- prev; old <- blockOf(p); inc <- blockOf(params)}
      yield inc < old).getOrElse(false)
    if (stale) None
    else {
      val base = prev.map(_.obj.toMap).getOrElse(Map.empty)
      val merged = params.obj.foldLeft(base) {
        case (acc, (k, JNull)) => acc - k
        case (acc, (k, v)) => acc.updated(k, v)
      }
      Some(JObject(merged.toList))
    }
  }
}
