package graft.exprs

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/** Malformed SQL-registration calls must surface as user-facing argument
  * errors (USER_RAISED_EXCEPTION), never as INTERNAL_ERROR (which renders
  * as an engine-bug banner).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("wrong arity raises a user error class") {
    val e = intercept[AnalysisException] {
      GraftExtensions.expectArity("shingles(text, n)", Seq(Literal(1)), 2)
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
    assert(e.getMessage.contains("expected 2 arguments, got 1"))
  }

  test("non-literal argument raises a user error class") {
    val e = intercept[AnalysisException] {
      GraftExtensions.intLit(
        org.apache.spark.sql.catalyst.expressions.Add(Literal(1), Literal(2)),
        "minhash_sig(tokens, numHashes)", "numHashes")
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
    assert(e.getMessage.contains("numHashes must be an integer literal"))
  }

  test("valid integer literals of any integral width are accepted") {
    assert(GraftExtensions.intLit(Literal(7), "f", "n") === 7)
    assert(GraftExtensions.intLit(Literal(7L), "f", "n") === 7)
    val e = intercept[AnalysisException] {
      GraftExtensions.intLit(Literal.create(null, IntegerType), "f", "n")
    }
    assert(e.getCondition === "USER_RAISED_EXCEPTION")
  }
}
