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
      idx.map(i => element_at(c, i + 1)).getOrElse(c)
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

  private def predicate(c: Column, dt: DataType, f: MetaFilter): Column = {
    // Asset coercion: "1.0000 EOS" filter value vs string field → compare
    // numeric parts when symbols match (common_functions.ts:294-299).
    val (lhs, rhs): (Column, Column) = (f.value, dt) match {
      case (assetRe(num, sym), StringType)
          if Set("eq", "ne", "gt", "gte", "lt", "lte").contains(f.operator) =>
        val fieldSym = element_at(split(c, " "), 2)
        val fieldNum = element_at(split(c, " "), 1).cast(DoubleType)
        (when(fieldSym === lit(sym), fieldNum), lit(num.toDouble))
      case (v, nt: NumericType) => (c, lit(v.toDouble).cast(nt))
      case (v, BooleanType)     => (c, lit(v.toBoolean))
      case (v, TimestampType)   => (c, to_timestamp(lit(v.replace(' ', 'T'))))
      // String field (e.g. a value pulled out of the opaque JSON blob)
      // compared against a numeric literal → numeric comparison, like the
      // reference's JS loose comparison in checkMetaFilter.
      case (v, StringType)
          if v.matches("^-?\\d+(\\.\\d+)?$") &&
            Set("eq", "ne", "gt", "gte", "lt", "lte").contains(f.operator) =>
        (c.cast(DoubleType), lit(v.toDouble))
      case (v, _)               => (c, lit(v))
    }
    f.operator match {
      case "eq"          => lhs === rhs
      case "ne"          => lhs =!= rhs
      case "gt"          => lhs > rhs
      case "gte"         => lhs >= rhs
      case "lt"          => lhs < rhs
      case "lte"         => lhs <= rhs
      case "contains"    => lhs.contains(f.value)
      case "starts_with" => lhs.startsWith(f.value)
      case "ends_with"   => lhs.endsWith(f.value)
      case op => throw new IllegalArgumentException(s"unknown operator: $op")
    }
  }
}
