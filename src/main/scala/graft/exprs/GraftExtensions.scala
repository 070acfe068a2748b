package graft.exprs

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.exprs.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (children: Seq[Expression]) => {
        def fail(msg: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" -> s"shingles(text, n): $msg"))
        if (children.size != 2) fail(s"expected 2 arguments, got ${children.size}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, dt)
              if (dt == org.apache.spark.sql.types.IntegerType ||
                dt == org.apache.spark.sql.types.LongType) && v != null =>
            v.toString.toInt
          case other => fail(s"n must be an integer literal, got $other")
        }
        Shingles(children(0), n)
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        if (children.size != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              s"simhash64(tokens): expected 1 argument, got ${children.size}"))
        SimHash64(children(0))
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        def fail(msg: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" -> s"minhash_sig(tokens, numHashes): $msg"))
        if (children.size != 2) fail(s"expected 2 arguments, got ${children.size}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, dt)
              if (dt == org.apache.spark.sql.types.IntegerType ||
                dt == org.apache.spark.sql.types.LongType) && v != null =>
            v.toString.toInt
          case other => fail(s"numHashes must be an integer literal, got $other")
        }
        MinHashSig(children(0), n)
      }))
    e.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (children: Seq[Expression]) => {
        // hyperplane_buckets(vec, tables, planes, dim) — int literals.
        // Arity/shape errors surface as AnalysisException (what SQL users
        // expect from a malformed call), never a raw ClassCastException.
        def fail(msg: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              s"hyperplane_buckets(vec, tables, planes, dim): $msg"))
        if (children.size != 4)
          fail(s"expected 4 arguments, got ${children.size}")
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, dt)
              if (dt == org.apache.spark.sql.types.IntegerType ||
                dt == org.apache.spark.sql.types.LongType ||
                dt == org.apache.spark.sql.types.ShortType ||
                dt == org.apache.spark.sql.types.ByteType) && v != null =>
            v.toString.toInt
          case other => fail(s"$name must be an integer literal, got $other")
        }
        HyperplaneBuckets(children(0),
          intLit(children(1), "tables"), intLit(children(2), "planes"),
          intLit(children(3), "dim"))
      }))
  }
}
