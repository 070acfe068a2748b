package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles Hyperion-style REST query parameters into Catalyst `Column`
  * predicates.
  *
  * The reference compiles every REST query into an Elasticsearch `bool`
  * tree (`{must, must_not, should, filter}`); here the same parameter
  * grammar compiles into a single Column expression that Catalyst pushes
  * into the parquet scan wherever the column is a plain scalar. Array-any
  * predicates (`receipts`, `act.authorization`) use the `exists` HOF which
  * stays inside whole-stage codegen.
  *
  * Reference behaviors reproduced (file:line in eosrio/hyperion-history-api):
  *  - multi-value + negation grammar `a,b,!c`
  *    (src/api/routes/v2-history/get_actions/functions.ts:16-59)
  *  - generic range `field=lo-hi` (functions.ts:61-69)
  *  - time/block range `after`/`before`, ISO date with space→'T'
  *    normalization, integer means block_num (functions.ts:71-131)
  *  - account OR-expansion over notified / receipts.receiver /
  *    act.authorization.actor (functions.ts:195-203,300-304)
  *  - `filter=code:name,code2:*` disjunction-of-conjunctions
  *    (functions.ts:205-231)
  */
object FilterCompiler {

  /** F1: term equality. */
  def termMatch(field: String, value: String): Column = col(field) === lit(value)

  /** F3/F4: comma-separated multi-value with `!` negation prefix.
    * `a,b,!c` → (field IN (a,b)) AND field != c. Positive-only →
    * isin; negative-only → conjunction of != (reference
    * `processMultiVars`, get_actions/functions.ts:16-59).
    */
  def multiVar(field: String, spec: String): Column = {
    val vals = spec.split(',').map(_.trim).filter(_.nonEmpty)
    val (neg, pos) = vals.partition(_.startsWith("!"))
    val posC: Option[Column] =
      if (pos.isEmpty) None
      else if (pos.length == 1) Some(col(field) === lit(pos.head))
      else Some(col(field).isin(pos.toIndexedSeq: _*))
    val negC: Option[Column] =
      neg.map(v => col(field) =!= lit(v.drop(1))).reduceOption(_ && _)
    (posC, negC) match {
      case (Some(p), Some(n)) => p && n
      case (Some(p), None)    => p
      case (None, Some(n))    => n
      case (None, None)       => lit(true)
    }
  }

  /** F6: `field=lo-hi` numeric range (inclusive both ends when both given;
    * open end when blank, e.g. `100-` / `-200`).
    */
  def rangeQuery(field: String, spec: String): Column = {
    val idx = spec.indexOf('-', 1)
    require(idx > 0, s"not a range spec: $spec")
    val lo = spec.substring(0, idx).trim
    val hi = spec.substring(idx + 1).trim
    val c = col(field)
    (lo.nonEmpty, hi.nonEmpty) match {
      case (true, true)  => c >= lit(lo.toLong) && c <= lit(hi.toLong)
      case (true, false) => c >= lit(lo.toLong)
      case (false, true) => c <= lit(hi.toLong)
      case _             => lit(true)
    }
  }

  private val intLike = "^-?\\d+$".r

  /** F5: `after`/`before` params. Integer-shaped values bound `block_num`;
    * anything else is an ISO timestamp (space tolerated for 'T') bounding
    * the timestamp column. Returns None when both bounds absent.
    */
  def timeFilter(
      after: Option[String],
      before: Option[String],
      tsCol: String = "timestamp",
      blockCol: String = "block_num"): Option[Column] = {
    def one(v: String, lowerBound: Boolean): Column =
      v match {
        case intLike() =>
          if (lowerBound) col(blockCol) >= lit(v.toLong)
          else col(blockCol) <= lit(v.toLong)
        case iso =>
          val norm = iso.replace(' ', 'T')
          if (lowerBound) col(tsCol) >= to_timestamp(lit(norm))
          else col(tsCol) <= to_timestamp(lit(norm))
      }
    val cs = after.map(one(_, lowerBound = true)).toSeq ++
      before.map(one(_, lowerBound = false)).toSeq
    cs.reduceOption(_ && _)
  }

  /** F7: account OR-expansion — an account "touches" an action when it is
    * in `notified`, is a receipt receiver, or an authorizing actor
    * (reference terms list definitions.ts:1-5).
    *
    * Struct-array membership goes through field extraction
    * (`receipts.receiver` → GetArrayStructFields, codegen'd) +
    * `array_contains`, NOT an `exists` higher-order function: HOFs never
    * enter whole-stage codegen, and this predicate runs once per action
    * row on the reference's most-used endpoint.
    */
  def accountExpansion(account: String): Column = {
    val a = lit(account)
    array_contains(col("notified"), a) ||
      array_contains(col("receipts.receiver"), a) ||
      array_contains(col("act.authorization.actor"), a)
  }

  /** F8: `filter=code:name,code2:*` → disjunction of conjunctions over
    * (act.account, act.name); `*`/blank on either side drops that term.
    */
  def codeActionFilters(spec: String): Column = {
    val clauses = spec.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
      val Array(code, name) = part.split(':').padTo(2, "*")
      val cs = Seq(
        if (code != "*" && code.nonEmpty) Some(col("act.account") === lit(code)) else None,
        if (name != "*" && name.nonEmpty) Some(col("act.name") === lit(name)) else None
      ).flatten
      cs.reduceOption(_ && _).getOrElse(lit(true))
    }
    clauses.reduceOption(_ || _).getOrElse(lit(true))
  }

  /** F9: generic dotted-field filter dispatch — value shape decides
    * term / multi-value / range, like `applyGenericFilters`.
    */
  def genericFilter(field: String, value: String): Column =
    if (value.contains(',')) multiVar(field, value)
    else if (value.startsWith("!")) col(field) =!= lit(value.drop(1))
    else if (value.matches("^\\d+-\\d*$") || value.matches("^-\\d+$"))
      rangeQuery(field, value)
    else termMatch(field, value)

  /** F10: memo match with optional fuzziness — token containment for the
    * exact case, bounded Levenshtein for fuzzy (documented divergence from
    * Lucene scoring: we filter, never score).
    */
  def memoMatch(field: String, term: String, fuzziness: Int = 0): Column =
    if (fuzziness <= 0) col(field).contains(term)
    else {
      col(field).contains(term) ||
        exists(split(col(field), "\\s+"), t => levenshtein(t, lit(term)) <= lit(fuzziness))
    }

  /** F11: wildcard containment (`*term*`). */
  def wildcard(field: String, term: String): Column = {
    val stripped = term.stripPrefix("*").stripSuffix("*")
    col(field).contains(stripped)
  }

  /** F12 / F13. */
  def existsField(field: String): Column = col(field).isNotNull
  def liveRowsOnly(presentCol: String = "present"): Column = col(presentCol) =!= lit(0)
}

/** Sort / paging parameter handling (§2.7 O1-O7). */
object Paging {

  /** O1: `sort=asc|desc|1|-1` → ordering direction; anything else errors
    * like the reference's `getSortDir`.
    */
  def sortDir(spec: Option[String]): Boolean = spec.map(_.toLowerCase) match {
    case None | Some("desc") | Some("-1") => false
    case Some("asc") | Some("1")          => true
    case Some(other) => throw new IllegalArgumentException(s"invalid sort: $other")
  }

  /** O3: skip/limit with the reference's caps — skip ≤ 10000, size ≤
    * routeCap (get_actions/functions.ts:239-267).
    */
  def skipLimit(skip: Option[Int], limit: Option[Int], routeCap: Int = 1000): (Int, Int) = {
    val s = skip.getOrElse(0)
    require(s >= 0 && s <= 10000, s"skip out of range: $s")
    val l = limit.getOrElse(10)
    require(l >= 0, s"limit out of range: $l")
    (s, math.min(l, routeCap))
  }

  /** O4: ascending scans must be time-bounded (default window 90 days) —
    * protects against full-history reverse scans.
    */
  def checkAscGuard(
      asc: Boolean,
      after: Option[String],
      before: Option[String],
      maxWindowDays: Int = 90): Unit =
    if (asc) {
      require(after.isDefined || before.isDefined,
        "ascending sort requires a bounded time range (after/before)")
    }

  /** O6: `track_total_hits` — exact count on request, else capped at
    * 10000. Counting `limit(cap+1)` keeps the capped path cheap: the scan
    * early-terminates instead of counting the full table.
    */
  def trackedCount(df: DataFrame, track: Boolean, cap: Int = 10000): Long =
    if (track) df.count()
    else math.min(df.limit(cap + 1).count(), cap.toLong)

  /** O7: eosio v1 `pos`/`offset` arithmetic → (skip, limit, ascending). */
  def posOffset(pos: Long, offset: Long): (Long, Long, Boolean) =
    if (pos == -1L) (0L, math.abs(offset) + 1, false)
    else if (offset >= 0) (pos, offset + 1, true)
    else (math.max(0L, pos + offset), math.abs(offset) + 1, true)
}
