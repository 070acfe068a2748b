package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Indexer black/whitelists (F15) — the reference filters the event
  * stream by `code::name` / `code::*` / `*::name` action rules and
  * `code::table` delta rules (src/indexer/modules/parsers/
  * base-parser.ts:40-70, deserializer.ts:322-353,586-610).
  *
  * The rule set is tiny and immutable per run → compiled once into a
  * single Column predicate (a broadcast-free literal disjunction that
  * Catalyst folds into the scan filter).
  */
final case class FilterRules(
    whitelist: Seq[String] = Nil, // "code::name", "code::*", "*::name"
    blacklist: Seq[String] = Nil)

object Rules {

  private def ruleToPredicate(rule: String, codeCol: Column, nameCol: Column): Column = {
    val Array(code, name) = rule.split("::").padTo(2, "*")
    val cs = Seq(
      if (code != "*") Some(codeCol === lit(code)) else None,
      if (name != "*") Some(nameCol === lit(name)) else None).flatten
    cs.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Compile the rule set: whitelist non-empty → only whitelisted rows
    * pass; blacklist always removes. Blacklist wins on conflict, like the
    * reference (checked first in `checkBlacklist`).
    */
  def compile(rules: FilterRules, codeCol: Column, nameCol: Column): Column = {
    val black = rules.blacklist
      .map(ruleToPredicate(_, codeCol, nameCol))
      .reduceOption(_ || _).getOrElse(lit(false))
    val white = rules.whitelist
      .map(ruleToPredicate(_, codeCol, nameCol))
      .reduceOption(_ || _).getOrElse(lit(true))
    !black && white
  }

  /** Apply to an action stream (code=act.account, name=act.name). */
  def filterActions(actions: DataFrame, rules: FilterRules): DataFrame =
    actions.filter(compile(rules, col("act.account"), col("act.name")))

  /** Apply to a delta stream (code, table). */
  def filterDeltas(deltas: DataFrame, rules: FilterRules): DataFrame =
    deltas.filter(compile(rules, col("code"), col("table")))
}

/** Plugin transform registry (X1/X4) — the reference loads per-contract
  * handler plugins (`processActionData` hooks, src/indexer/modules/
  * loader.ts) and custom action decoders (`actionReinterpretMap`).
  * Engine-side: user-registered `DataFrame => DataFrame` transforms keyed
  * by `code::name` pattern, applied in registration order to the matching
  * slice of the stream.
  */
object PluginRegistry {

  final case class Plugin(pattern: String, transform: DataFrame => DataFrame)

  /** Apply each plugin to its matching slice and union with the
    * untouched remainder. Slices are matched with the same rule grammar
    * as Rules (`code::name`, `code::*`, `*::name`).
    */
  def apply(actions: DataFrame, plugins: Seq[Plugin]): DataFrame =
    plugins.foldLeft(actions) { (df, p) =>
      val pred = Rules.compile(FilterRules(whitelist = Seq(p.pattern)),
        col("act.account"), col("act.name"))
      val transformed = p.transform(df.filter(pred))
      require(transformed.columns.sameElements(df.columns),
        s"plugin ${p.pattern} must preserve the schema")
      transformed.unionByName(df.filter(!pred))
    }
}
