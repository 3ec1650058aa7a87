package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline data-quality expectations (dbt-test style), returned as
  * VIOLATION sets — empty result == constraint holds, and the violating
  * keys themselves are reportable/oracle-checkable rather than a bare
  * boolean. Both checks are single aggregations/joins: at 100 TB the
  * uniqueness check is one partial-aggregated count on the key and the
  * integrity check one (broadcastable) anti-join — no full-row shuffles.
  */
object Checks {

  /** Key groups with more than one row (uniqueness violations), with their
    * multiplicities: (cols..., n_rows).
    */
  def duplicateKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (referential-integrity orphans). Null child keys are not orphans (SQL
    * foreign-key semantics).
    */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")
}
