package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two versions of a keyed table — the
  * data-reconciliation primitive behind incremental publishing, CDC
  * validation, and "what changed since yesterday" audits.
  *
  * Scale shape: one FULL OUTER sort-merge join keyed on the table key
  * (each side shuffles once); classification is a map-side expression
  * over the joined row. At 100 TB, pre-filter both sides with
  * partition-level checksums (e.g. a per-partition xxhash64 aggregate)
  * so partitions that hash equal skip the row-level join entirely.
  */
object Diff {

  /** Row-level classification: returns one row per key present in either
    * version with `change_type` in {added, removed, changed, unchanged}
    * (null-safe comparison over `compareCols`). Both versions' compare
    * columns ride along as `old_*` / `new_*` for downstream inspection.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val o = oldDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("__in_old"): _*)
    val n = newDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("__in_new"): _*)
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }

  /** The one-line audit summary: counts per change type. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                  compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, keys, compareCols)
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("change_type"))
}
