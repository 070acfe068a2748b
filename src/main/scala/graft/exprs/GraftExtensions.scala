package graft.exprs

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.exprs.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.{expectArity, intLit}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        expectArity("cosine_sim(a, b)", children, 2)
        CosineSim(children(0), children(1))
      }))
    e.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (children: Seq[Expression]) => {
        expectArity("shingles(text, n)", children, 2)
        Shingles(children(0), intLit(children(1), "shingles(text, n)", "n"))
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        expectArity("simhash64(tokens)", children, 1)
        SimHash64(children(0))
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        expectArity("minhash_sig(tokens, numHashes)", children, 2)
        MinHashSig(children(0),
          intLit(children(1), "minhash_sig(tokens, numHashes)", "numHashes"))
      }))
    e.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (children: Seq[Expression]) => {
        val fn = "hyperplane_buckets(vec, tables, planes, dim)"
        expectArity(fn, children, 4)
        HyperplaneBuckets(children(0),
          intLit(children(1), fn, "tables"), intLit(children(2), fn, "planes"),
          intLit(children(3), fn, "dim"))
      }))
  }
}

private[exprs] object GraftExtensions {

  /** Malformed calls (wrong arity, non-literal argument) are USER errors:
    * raise them under a user-facing error class — not INTERNAL_ERROR,
    * which renders as an engine-bug banner — and never let a raw
    * ClassCastException escape the builder.
    */
  private[exprs] def userError(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> msg))

  private[exprs] def intLit(e: Expression, fn: String, name: String): Int = e match {
    case Literal(v, dt)
        if (dt == IntegerType || dt == LongType || dt == ShortType ||
          dt == ByteType) && v != null =>
      v.toString.toInt
    case other => userError(s"$fn: $name must be an integer literal, got $other")
  }

  private[exprs] def expectArity(fn: String, children: Seq[Expression], n: Int): Unit =
    if (children.size != n)
      userError(s"$fn: expected $n arguments, got ${children.size}")
}
