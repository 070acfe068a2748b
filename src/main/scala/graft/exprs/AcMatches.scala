package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-pattern occurrence counts of a fixed multi-pattern set in one
  * text pass — Aho–Corasick over the classic goto/fail/output
  * automaton (Aho & Corasick 1975), the shape of a banned-phrase /
  * policy-term scan over a crawl corpus: the naive plan is one scan
  * PER PATTERN (or one regex alternation whose NFA backtracks); this
  * is O(len + matches) per document for ANY pattern count, inside
  * whole-stage codegen.
  *
  * Element i of the result counts ALL occurrences of `patterns(i)`
  * (overlapping included — every match is reported at its end
  * position, the standard AC semantics). Matching is exact on UTF-16
  * chars, case-sensitive; callers lower/normalize upstream.
  *
  * The automaton is built once per plan (a few KB for realistic
  * blocklists) and shipped to generated code via `addReferenceObj` —
  * the [[PqCodes]] lesson: never unroll a table into a literal tree.
  */
case class AcMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "pattern set must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  @transient private lazy val automaton = new AcAutomaton(patterns.toArray)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ac_matches expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    automaton.counts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcMatches =
    copy(child = newChild)
}

object AcMatches {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(AcMatches(GraftShim.expression(text), patterns))
}

/** Goto/fail/output automaton. Built on first use per JVM (transient
  * in the expression); nodes in insertion order, children as per-node
  * char→node maps (blocklists are small — locality beats a flat
  * 64k-wide table), fail links by BFS, output lists MERGED down fail
  * chains at build time so matching never chases the chain.
  */
final class AcAutomaton(patterns: Array[String]) extends Serializable {

  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val out = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.empty)

  // trie
  for ((p, pi) <- patterns.zipWithIndex) {
    var node = 0
    for (c <- p) {
      val next = children(node).get(c)
      node = if (next != null) next.intValue()
      else {
        children += new java.util.HashMap[Character, Integer]()
        fail += 0
        out += Array.empty
        children(node).put(c, children.size - 1)
        children.size - 1
      }
    }
    out(node) = out(node) :+ pi
  }
  // BFS fail links + output merge
  {
    val queue = new java.util.ArrayDeque[Integer]()
    val rootIt = children(0).entrySet().iterator()
    while (rootIt.hasNext) {
      val v = rootIt.next().getValue.intValue()
      fail(v) = 0; queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      val it = children(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val v = e.getValue.intValue()
        var f = fail(u)
        while (f != 0 && children(f).get(c) == null) f = fail(f)
        val fc = children(f).get(c)
        fail(v) = if (fc != null && fc.intValue() != v) fc.intValue() else 0
        out(v) = out(v) ++ out(fail(v))
        queue.add(v)
      }
    }
  }

  val nPatterns: Int = patterns.length

  /** Occurrence counts per pattern index (all matches, overlapping
    * included). Entry point for generated code.
    */
  def counts(text: UTF8String): ArrayData = {
    val s = text.toString
    val acc = new Array[Long](nPatterns)
    var node = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var next = children(node).get(c)
      while (next == null && node != 0) {
        node = fail(node)
        next = children(node).get(c)
      }
      if (next != null) node = next.intValue()
      val o = out(node)
      var k = 0
      while (k < o.length) { acc(o(k)) += 1L; k += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }
}
