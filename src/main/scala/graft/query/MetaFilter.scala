package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Post-scan row-filter DSL over dotted paths — the engine-side equivalent
  * of the reference's `checkMetaFilter`
  * (src/indexer/helpers/common_functions.ts:260-339) with the operator set
  * of src/interfaces/stream-requests.ts: `eq ne gt gte lt lte contains
  * starts_with ends_with`.
  *
  * Semantics reproduced:
  *  - dotted paths navigate structs; stepping *into* an array of structs
  *    switches to array-any semantics (`exists`), like the reference's
  *    recursive any-match over arrays;
  *  - explicit `arr[i]` indexing via `element_at` (reference `getNested`);
  *  - when the path descends into an opaque JSON-string column (the
  *    un-indexed `data` blob), evaluation falls back to
  *    `get_json_object` — post-scan, exactly like the reference which can
  *    only check those after fetching `_source`;
  *  - asset coercion: a filter value shaped `"1.0000 EOS"` compares the
  *    numeric part against the field's numeric part iff the symbols match.
  *
  * When the path resolves to a typed scalar column the returned predicate
  * is an ordinary Catalyst expression, so it is *pushed down* to the scan
  * — strictly better than the reference, which always post-filters.
  */
final case class MetaFilter(field: String, operator: String, value: String)

object MetaFilters {

  private val indexed = "^(.*)\\[(\\d+)]$".r
  private val assetRe = "^(-?\\d+(?:\\.\\d+)?) ([A-Z]{1,7})$".r

  /** Compile one filter against `df`'s schema. */
  def compile(df: DataFrame, f: MetaFilter): Column = {
    val parts = f.field.split('.').toList
    resolve(df.schema, None, parts, f)
  }

  /** AND of a filter list ("and" mode) or OR ("or" mode) — stream requests
    * support `filter_op: and|or` (src/api/helpers/streamFunctions.ts:58-92).
    */
  def compileAll(df: DataFrame, fs: Seq[MetaFilter], andMode: Boolean = true): Column =
    fs.map(compile(df, _))
      .reduceOption((a: Column, b: Column) => if (andMode) a && b else a || b)
      .getOrElse(lit(true))

  private def resolve(
      schema: DataType,
      base: Option[Column],
      path: List[String],
      f: MetaFilter): Column = {

    def step(name: String): Column = {
      val (field, idx) = name match {
        case indexed(n, i) => (n, Some(i.toInt))
        case n             => (n, None)
      }
      val c = base.map(_.getField(field)).getOrElse(col(field))
      // try_element_at: an index past the array's end is no-match, not an
      // ANSI INVALID_ARRAY_INDEX failure of the whole query
      idx.map(i => try_element_at(c, lit(i + 1))).getOrElse(c)
    }

    path match {
      case Nil =>
        predicate(base.getOrElse(lit(null)), schema, f)
      case name :: rest =>
        val fieldName = name match { case indexed(n, _) => n; case n => n }
        val isIndexed = name != fieldName
        schema match {
          case st: StructType =>
            st.find(_.name == fieldName) match {
              case Some(sf) =>
                val inner = (sf.dataType, isIndexed) match {
                  case (ArrayType(et, _), true) => et
                  case (dt, _)                  => dt
                }
                (inner, isIndexed, sf.dataType) match {
                  // descend into array-of-struct without index → any-match
                  case (_, false, ArrayType(et: StructType, _)) if rest.nonEmpty =>
                    val arr = step(name)
                    exists(arr, x => resolveInArray(et, x, rest, f))
                  case (_, false, ArrayType(et, _)) if rest.isEmpty =>
                    // terminal array of scalars → any element matches
                    exists(step(name), x => predicate(x, et, f))
                  case _ =>
                    resolve(inner, Some(step(name)), rest, f)
                }
              case None =>
                throw new IllegalArgumentException(s"no such field: $fieldName")
            }
          case StringType =>
            // opaque JSON blob — evaluate remaining path post-scan
            val jsonPath = "$." + (name :: rest).mkString(".")
            predicate(get_json_object(base.get, jsonPath), StringType, f)
          case other =>
            throw new IllegalArgumentException(
              s"cannot descend into $other at $name")
        }
    }
  }

  /** Path resolution inside an `exists` lambda variable. */
  private def resolveInArray(
      schema: DataType,
      x: Column,
      path: List[String],
      f: MetaFilter): Column =
    path match {
      case Nil => predicate(x, schema, f)
      case name :: rest =>
        schema match {
          case st: StructType =>
            st.find(_.name == name) match {
              case Some(sf) =>
                sf.dataType match {
                  case ArrayType(et: StructType, _) if rest.nonEmpty =>
                    exists(x.getField(name), y => resolveInArray(et, y, rest, f))
                  case ArrayType(et, _) if rest.isEmpty =>
                    exists(x.getField(name), y => predicate(y, et, f))
                  case dt => resolveInArray(dt, x.getField(name), rest, f)
                }
              case None =>
                throw new IllegalArgumentException(s"no such field: $name")
            }
          case StringType =>
            predicate(get_json_object(x, "$." + path.mkString(".")), StringType, f)
          case other =>
            throw new IllegalArgumentException(s"cannot descend into $other")
        }
    }

  private val cmpOps = Set("eq", "ne", "gt", "gte", "lt", "lte")
  private val numericLit = "^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"

  /** A string column cast to double only where it is numeric-shaped —
    * elsewhere null, so the comparison is simply no-match. A bare `cast`
    * would throw under ANSI mode (Spark 4 default) the moment any row
    * holds a non-numeric string, turning one odd row into a failed query.
    */
  private def numericOrNull(c: Column): Column =
    when(c.rlike(numericLit), c.cast(DoubleType))

  private def predicate(c: Column, dt: DataType, f: MetaFilter): Column = {
    // Asset coercion: "1.0000 EOS" filter value vs string field → compare
    // numeric parts when symbols match (common_functions.ts:294-299).
    val coerced: Option[(Column, Column)] = (f.value, dt) match {
      case (assetRe(num, sym), StringType) if cmpOps.contains(f.operator) =>
        // try_element_at: a field without a space ("12.5") has no symbol
        // part — that is symbol-mismatch (null → no match), not an ANSI
        // out-of-bounds failure
        val fieldSym = try_element_at(split(c, " "), lit(2))
        val fieldNum = numericOrNull(try_element_at(split(c, " "), lit(1)))
        Some((when(fieldSym === lit(sym), fieldNum), lit(num.toDouble)))
      case (v, _: NumericType) =>
        // A value that cannot be a number compares like NaN in the
        // reference's JS loose comparison: every relational test is
        // false, inequality is true (handled below) — not a thrown
        // NumberFormatException. Both sides compare as doubles (JS
        // numbers ARE doubles); casting the value to the field's type
        // instead would make `n eq "2.5"` match n=2 by truncation.
        v.toDoubleOption.map(dv => (c.cast(DoubleType), lit(dv)))
      case (v, BooleanType) => v.toBooleanOption.map(bv => (c, lit(bv)))
      case (v, TimestampType) =>
        Some((c, try_to_timestamp(lit(v.replace(' ', 'T')))))
      // String field (e.g. a value pulled out of the opaque JSON blob)
      // compared against a numeric literal → numeric comparison, like the
      // reference's JS loose comparison in checkMetaFilter.
      case (v, StringType)
          if v.matches("^-?\\d+(\\.\\d+)?$") && cmpOps.contains(f.operator) =>
        Some((numericOrNull(c), lit(v.toDouble)))
      case (v, _) => Some((c, lit(v)))
    }
    (coerced, f.operator) match {
      // a present value is always unequal to an un-number; a null field
      // never matches any filter (the engine-wide null convention)
      case (None, "ne")                   => c.isNotNull
      case (None, op) if cmpOps
        .contains(op)                     => lit(false)
      // string ops never numerically coerce — re-resolve as a plain
      // string comparison (always yields a coercion, so this terminates)
      case (None, _)                      => predicate(c, StringType, f)
      case (Some((lhs, rhs)), op) => op match {
        case "eq"          => lhs === rhs
        case "ne"          => lhs =!= rhs
        case "gt"          => lhs > rhs
        case "gte"         => lhs >= rhs
        case "lt"          => lhs < rhs
        case "lte"         => lhs <= rhs
        case "contains"    => lhs.contains(f.value)
        case "starts_with" => lhs.startsWith(f.value)
        case "ends_with"   => lhs.endsWith(f.value)
        case other => throw new IllegalArgumentException(s"unknown operator: $other")
      }
    }
  }
}
