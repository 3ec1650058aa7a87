package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON rendering extras beyond stock `to_json` (SURVEY.md §2 A18 parity
  * residue): the reference's serializer takes a caller-supplied null token
  * (reference SerDeUtils.java:201-210, `getJSONString(..., nullStr)`) and
  * writes it raw wherever a value is NULL — e.g. `\N` for Hive text-table
  * compatibility, or `""` to blank nulls out.
  */
object JsonFunctions {

  /** `to_json` with explicit nulls rendered as `nullStr` instead of the JSON
    * literal `null`. The token is substituted post-render on the compact
    * `to_json` output, matching the reference's writer behavior (the token is
    * written RAW, so a non-`null` token generally yields non-standard JSON —
    * exactly what the reference's Hive-text consumers expect).
    *
    * The substitution targets `null` only in value position of the compact
    * rendering (after `:` `,` or `[`, before `,` `}` or `]`). A STRING value
    * that itself contains such a pattern (e.g. `"a:null,b"`) would be
    * rewritten too — the same ambiguity the reference's raw-token scheme has
    * on read; use the default token where field values may embed JSON.
    */
  def toJsonNullStr(c: Column, nullStr: String): Column = {
    val rendered = to_json(c, Map("ignoreNullFields" -> "false"))
    if (nullStr == "null") rendered
    else {
      // replacement is a literal: escape regex-replacement metachars ($, \)
      val token = java.util.regex.Matcher.quoteReplacement(nullStr)
      regexp_replace(rendered, "(?<=[:,\\[])null(?=[,}\\]])", token)
    }
  }
}
