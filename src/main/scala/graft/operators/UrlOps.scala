package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for crawled-corpus pipelines — the step between a WARC
  * walk and per-domain policy (caps, dedup, blocklists): canonicalize
  * URLs so the same resource keys identically, extract hosts and
  * REGISTERED domains (the per-publisher aggregation unit), and dedupe
  * on the canonical form. Everything is built from codegen'd string
  * `functions._` — no UDF anywhere — so plans stay whole-stage and the
  * DuckDB oracle replays every rule.
  *
  * Canonicalization rules (the deterministic subset every dedup paper
  * applies): drop the fragment; lowercase scheme and host; strip a
  * `www.` prefix and a trailing dot from the host; strip the port when
  * it is the scheme default (http:80, https:443), keep it otherwise;
  * empty path becomes `/`; the query string is kept byte-for-byte
  * (reordering parameters changes semantics for some endpoints — out
  * of scope by design, documented).
  *
  * Registered-domain extraction uses an explicit two-level-suffix list
  * (`co.uk`-style) passed by the caller — the full Public Suffix List
  * is a data file a deployment ships; the ALGORITHM (last two labels,
  * or three when the last two are a listed public suffix) is what is
  * implemented and tested here. At 100 TB both ops are scan-local
  * column work; the dedup is one hash aggregate on the canonical key.
  */
object UrlOps {

  /** Default two-level public suffixes for the demo surface. */
  val CommonTwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za")

  /** Fragment-stripped working form. */
  private def noFrag(url: Column): Column = regexp_replace(url, "#.*$", "")

  /** Lowercased scheme ("" when the URL has none). */
  def scheme(url: Column): Column =
    lower(regexp_extract(noFrag(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical host: lowercased, `www.`-stripped, trailing-dot-stripped,
    * port removed.
    */
  def host(url: Column): Column = {
    val raw = regexp_extract(noFrag(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1)
    val noPort = regexp_replace(lower(raw), ":[0-9]+$", "")
    regexp_replace(regexp_replace(noPort, "\\.$", ""), "^www\\.", "")
  }

  /** Port as a string, "" when absent. */
  private def port(url: Column): Column =
    regexp_extract(
      regexp_extract(noFrag(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1),
      ":([0-9]+)$", 1)

  /** Canonical URL per the object contract; null for URLs with no
    * `scheme://host` shape (callers filter or quarantine those).
    */
  def canonicalize(url: Column): Column = {
    val s = scheme(url)
    val h = host(url)
    val p = port(url)
    val defaultPort =
      (s === "http" && p === "80") || (s === "https" && p === "443")
    val keptPort = when(p === "" || defaultPort, lit("")).otherwise(concat(lit(":"), p))
    val rest = regexp_extract(noFrag(url), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([/?].*)?$", 1)
    // empty path → "/"; a query with no path gets the "/" re-inserted
    // ("https://h?q=1" → "https://h/?q=1") so equal resources key equal
    val path = when(rest === "", lit("/"))
      .when(rest.startsWith("?"), concat(lit("/"), rest))
      .otherwise(rest)
    when(s === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(s, lit("://"), h, keptPort, path))
  }

  /** Registered domain of `hostCol`: last two labels, or three when the
    * last two are a listed public suffix; the bare host when it has no
    * dot (e.g. `localhost`).
    */
  def registeredDomain(
      hostCol: Column,
      twoLevelSuffixes: Seq[String] = CommonTwoLevelSuffixes): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(n <= 2, hostCol)
      .otherwise(when(last2.isInCollection(twoLevelSuffixes), last3)
        .otherwise(last2))
  }

  /** URL-keyed exact dedup: first doc per canonical URL wins (smallest
    * `idCol` — deterministic), invalid URLs quarantined under a null
    * key are DROPPED (they cannot be deduped, only counted upstream).
    * One hash aggregate on the canonical key; 100 TB shape: shuffle
    * carries one row per distinct URL after map-side combine.
    */
  def dedupByCanonicalUrl(
      df: DataFrame,
      idCol: String,
      urlCol: String): DataFrame = {
    df.select(col(idCol), col(urlCol),
        canonicalize(col(urlCol)).as("__canon"))
      .filter(col("__canon").isNotNull)
      .groupBy(col("__canon").as("canonical_url"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))
  }
}
