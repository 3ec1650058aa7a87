package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The dataflow operator surface the reference's test suite exercises
  * (SURVEY.md §2B), exposed as extension methods on DataFrame so pipelines
  * compose fluently: `df.removeWhere(...).coerce(...).countBy(...)`.
  *
  * Semantic notes (the Cascading traps, SURVEY.md §7.3):
  *   - `removeWhere` is discard-when-true (Cascading ExpressionFilter,
  *     HCatTapTest.java:122-134): a row is removed iff the predicate is TRUE;
  *     NULL predicate keeps the row. Hence `!coalesce(cond, false)`, not
  *     `!cond` (which would also drop NULL-predicate rows).
  *   - `countBy` / `sortedGroupBy` emit key-sorted output (Cascading GroupBy
  *     contract, ORCFileTest.java:255,270-281); Spark's groupBy does not sort,
  *     so an explicit orderBy on the grouping keys is appended.
  *   - `splitGenerate` keeps empty tokens (RegexSplitGenerator,
  *     ORCFileTest.java:247-251: the test expects "" with count 9). Spark's
  *     `split` with the default limit -1 keeps them, matching.
  */
package object ops {

  implicit class GraftOps(val df: DataFrame) {

    /** Remove rows where `cond` evaluates TRUE; NULL keeps the row
      * (Cascading filter semantics, SURVEY.md §2 B3).
      */
    def removeWhere(cond: Column): DataFrame =
      df.filter(!coalesce(cond, lit(false)))

    /** Remove rows where the SQL expression evaluates TRUE. */
    def removeWhere(sqlExpr: String): DataFrame = removeWhere(expr(sqlExpr))

    /** Projection to a named subset in the given order (Identity(Fields),
      * SURVEY.md §2 B2).
      */
    def identitySelect(cols: String*): DataFrame =
      df.select(cols.map(col): _*)

    /** Column type coercion in place (Coerce, SURVEY.md §2 B4). */
    def coerce(casts: (String, DataType)*): DataFrame =
      casts.foldLeft(df) { case (d, (name, t)) =>
        d.withColumn(name, col(name).cast(t))
      }

    def coerceDdl(casts: (String, String)*): DataFrame =
      coerce(casts.map { case (n, t) => n -> graft.schema.HiveDdl.parseTypeName(t) }: _*)

    /** Group by keys, apply aggregates, emit key-sorted (Cascading GroupBy +
      * Every, SURVEY.md §2 B5/B6). Spark does partial (map-side) + final
      * aggregation automatically; the orderBy is a final single-stage sort on
      * the already-aggregated (small) result.
      */
    def sortedGroupBy(keys: Seq[String], aggs: Seq[Column]): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(keys.map(col): _*)

    /** Count per key, key-sorted (CountBy, SURVEY.md §2 B7). Map-side partial
      * counting comes free from HashAggregateExec.
      */
    def countBy(keys: Seq[String], countName: String = "count"): DataFrame =
      sortedGroupBy(keys, Seq(count(lit(1)).as(countName)))

    /** Regex split + one output row per token, input fields discarded
      * (RegexSplitGenerator with Fields.RESULTS, SURVEY.md §2 B8). Empty
      * tokens are preserved.
      */
    def splitGenerate(input: Column, regex: String, outName: String = "token"): DataFrame =
      df.select(explode(split(input, regex, -1)).as(outName))

    /** Rename all columns positionally to _col0.._colN (the reference's
      * unnamed-sink convention, SURVEY.md §2 A8).
      */
    def withDefaultColNames: DataFrame =
      df.toDF(graft.schema.HiveDdl.defaultColNames(df.columns.length): _*)
  }
}
