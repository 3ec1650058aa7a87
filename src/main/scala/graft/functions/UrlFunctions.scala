package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key step before URL-level dedup of a web
  * crawl (the cheapest dedup signal there is: two fetches of the same
  * canonical URL are the same page, no text comparison needed).
  *
  * Canonical form:
  *   - scheme and host lowercased; leading `www.` dropped;
  *   - default port stripped (`:443` for https, `:80` for http);
  *   - fragment dropped;
  *   - tracking parameters dropped (`utm_*`, `fbclid`, `gclid`);
  *   - remaining query parameters sorted bytewise;
  *   - trailing slashes on the path dropped.
  *
  * Everything is a composition of codegen'd built-ins (regexp ops, array
  * filter/sort) — no UDF, so the canonicalization runs inside whole-stage
  * codegen and pushes through a 100 TB crawl as a map-only pass.
  *
  * [[canonicalizeUrlSql]] renders the IDENTICAL step chain in DuckDB SQL
  * so oracle queries stay in lockstep with the Column implementation.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val rest = regexp_replace(url, SchemeRe, "")
    val nofrag = regexp_replace(rest, "#.*$", "")
    val hp0 = regexp_replace(lower(regexp_extract(nofrag, "^([^/?]*)", 1)),
      "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(hp0, ":443$", ""))
      .when(scheme === "http", regexp_replace(hp0, ":80$", ""))
      .otherwise(hp0)
    val pathq = regexp_replace(nofrag, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val qs = regexp_extract(pathq, "[?](.*)$", 1)
    val params = filter(split(qs, "&", -1), p =>
      length(p) > 0 && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    val joined = array_join(sort_array(params), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(joined =!= "", concat(lit("?"), joined)).otherwise(lit("")))
    when(scheme === "", url).otherwise(canon)
  }

  /** The same canonicalization over a SQL expression `u`, in DuckDB
    * dialect (regexp_* + list lambdas). Kept step-for-step identical to
    * [[canonicalizeUrl]].
    */
  def canonicalizeUrlSql(u: String): String = {
    val scheme = s"lower(regexp_extract($u, '$SchemeRe', 1))"
    val rest = s"regexp_replace($u, '$SchemeRe', '')"
    val nofrag = s"regexp_replace($rest, '#.*$$', '')"
    val hp0 = s"regexp_replace(lower(regexp_extract($nofrag, '^([^/?]*)', 1)), '^www\\.', '')"
    val host = s"CASE WHEN $scheme = 'https' THEN regexp_replace($hp0, ':443$$', '') " +
      s"WHEN $scheme = 'http' THEN regexp_replace($hp0, ':80$$', '') ELSE $hp0 END"
    val pathq = s"regexp_replace($nofrag, '^[^/?]*', '')"
    val path = s"regexp_replace(regexp_extract($pathq, '^([^?]*)', 1), '/+$$', '')"
    val qs = s"regexp_extract($pathq, '[?](.*)$$', 1)"
    val params = s"list_filter(string_split($qs, '&'), p -> p <> '' " +
      "AND NOT starts_with(p, 'utm_') AND NOT starts_with(p, 'fbclid=') " +
      "AND NOT starts_with(p, 'gclid='))"
    val joined = s"array_to_string(list_sort($params), '&')"
    s"CASE WHEN $scheme = '' THEN $u ELSE $scheme || '://' || $host || $path || " +
      s"(CASE WHEN $joined <> '' THEN '?' || $joined ELSE '' END) END"
  }
}
