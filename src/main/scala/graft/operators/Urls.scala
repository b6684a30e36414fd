package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for corpus-level URL dedup (the CommonCrawl-style
  * pipeline step: the same page is fetched as `HTTP://Site.com:80/a?b=1`
  * and `http://site.com/a?b=1` — normalize before grouping or the dedup
  * undercounts).
  *
  * Steps (all engine-portable: no lookahead — RE2 has none — and no
  * inline `(?i)` flags, per the advisor's portability note; character
  * classes instead):
  *  1. trim, strip the `#fragment`;
  *  2. lowercase the `scheme://host[:port]` prefix (path/query keep case);
  *  3. drop explicit default ports (`http…:80`, `https…:443`);
  *  4. split the query, drop tracking params (`utm_*`, `gclid`,
  *     `fbclid`) and empties, sort the rest (binary order — ASCII URLs
  *     sort identically in both engines), rejoin. Tracking-param
  *     matching is case-SENSITIVE by design: query parameter names are
  *     case-sensitive per RFC 3986 and the utm_/gclid conventions are
  *     lowercase — lowercasing the whole query would corrupt values.
  *
  * Scale shape: one projection — regexp/split/sort built-ins over each
  * row, no shuffle, no state. The query-part filter is a HOF lambda
  * (interpreted in Spark); URLs are short, so the cost is bounded — a
  * hot 100 TB path would move the filter into a kernel expression like
  * [[graft.functions.TextStatsKernel]].
  */
object Urls {

  private val PrefixRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  def normalizeUrl(u: Column): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#.*", "")
    val prefix = regexp_extract(noFrag, PrefixRe, 0)
    val lowered = concat(lower(prefix),
      noFrag.substr(length(prefix) + 1, length(noFrag)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    val base = regexp_replace(noPort, "\\?.*", "")
    val q = regexp_extract(noPort, "\\?(.*)", 1)
    val kept = filter(split(q, "&"), p =>
      p =!= lit("") && !p.startsWith("utm_") &&
        !p.startsWith("gclid=") && !p.startsWith("fbclid="))
    val canon = array_join(array_sort(kept), "&")
    when(canon === lit(""), base).otherwise(concat(base, lit("?"), canon))
  }

  /** Lowercased host of a URL — scheme and port stripped, a leading
    * `www.` dropped (the grouping key a per-site cap actually wants:
    * `WWW.Site.com:443` and `site.com` are one site). Scheme-less
    * inputs ("site.com/path") resolve too. Engine-portable: one
    * non-capturing-group extract + one anchored replace, no lookahead. */
  def host(u: Column): Column =
    regexp_replace(
      regexp_extract(lower(trim(u)),
        "^(?:[a-z][a-z0-9+.-]*://)?([^/?#:]+)", 1),
      "^www\\.", "")

  /** DuckDB expression replaying [[host]] (regexp_extract yields NULL
    * on no match where Spark yields '' — coalesced). */
  def hostOracleExpr(expr: String): String =
    "regexp_replace(coalesce(regexp_extract(lower(trim(" + expr + ")), " +
      "'^(?:[a-z][a-z0-9+.-]*://)?([^/?#:]+)', 1), ''), '^www\\.', '')"

  /** Per-domain document cap — the web-curation rule that stops one
    * site from dominating the corpus (C4 and the CommonCrawl recipes
    * all bound per-host contribution): keep at most `n` docs per
    * [[host]], selected in deterministic md5-of-id order so any
    * cluster size, any rerun, and the oracle pick the same rows.
    * Output adds `domain` and `rn` (1-based rank within the host).
    *
    * A deliberate thin composition: host extraction is a projection and
    * the cap rides [[Sampling.stratifiedSampleN]]'s bounded-heap
    * [[graft.plans.TopK]] — one exchange on the domain key, O(n) heap
    * per domain, never a per-domain sort. */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
      n: Int): DataFrame =
    Sampling.stratifiedSampleN(
      df.withColumn("domain", host(col(urlCol))), "domain", idCol, n)

  /** DuckDB expression replaying [[normalizeUrl]] over `expr` (dialect
    * deltas: `\\1` capture refs, list_* names, starts_with). */
  def normalizeOracleExpr(expr: String): String = {
    val t = s"trim($expr)"
    val noFrag = s"regexp_replace($t, '#.*', '')"
    val prefix = s"regexp_extract($noFrag, '$PrefixRe')"
    val lowered = s"concat(lower($prefix), substr($noFrag, length($prefix) + 1))"
    val noPort = "regexp_replace(regexp_replace(" + lowered +
      ", '^(http://[^/?#:]*):80([/?#].*)?$', '\\1\\2')" +
      ", '^(https://[^/?#:]*):443([/?#].*)?$', '\\1\\2')"
    val base = s"regexp_replace($noPort, '\\?.*', '')"
    // DuckDB regexp_extract yields NULL on no match (Spark yields ''),
    // and array_to_string of an EMPTY list yields NULL too — coalesce
    // both so the empty-query case compares equal to ''.
    val q = s"coalesce(regexp_extract($noPort, '\\?(.*)', 1), '')"
    val kept = s"list_filter(string_split($q, '&'), p -> p <> '' " +
      "AND NOT starts_with(p, 'utm_') AND NOT starts_with(p, 'gclid=') " +
      "AND NOT starts_with(p, 'fbclid='))"
    val canon = s"coalesce(array_to_string(list_sort($kept), '&'), '')"
    s"CASE WHEN $canon = '' THEN $base ELSE concat($base, '?', $canon) END"
  }
}
