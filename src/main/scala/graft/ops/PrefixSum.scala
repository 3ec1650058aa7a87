package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sums.
  *
  * The naive formulation — `sum(x) over (partition by grp order by ord)` —
  * funnels each ENTIRE group through one task: with language-sized groups at
  * 100 TB that is a single task holding 40 TB. Here the heavy pass is
  * bounded by the RANGE-partition size instead, regardless of group sizes:
  *
  *   1. range-partition by (grp, ord) — contiguous runs, evenly sized;
  *   2. one tiny aggregate of per-(partition, group) totals;
  *   3. per-(partition, group) OFFSETS by a window over those totals
  *      (<= partitions x groups rows — trivially small);
  *   4. within-partition running sum (window keyed by partition id, so its
  *      shuffle groups are range-partition-sized, never group-sized) plus
  *      the broadcast offset.
  *
  * Two extra tiny shuffles buy an even per-task bound — the classic
  * two-phase scan/prefix-sum decomposition.
  */
object PrefixSum {

  /** `out` = running sum of `value` within `grp` in `ord` order (exact,
    * including the current row). `ord` must be unique within each group for
    * a deterministic result. `value` must be integral (the sum is a long).
    */
  def groupedRunningSum(df: DataFrame, grp: String, ord: String,
                        value: Column, out: String,
                        numPartitions: Int = 0): DataFrame = {
    val p = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .withColumn("__val", value.cast("long"))
      .repartitionByRange(p, col(grp), col(ord))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = ranged.groupBy(col("__pid"), col(grp))
      .agg(sum(col("__val")).as("__tot"))
    // offset for (pid, grp) = sum of the SAME group's totals in earlier
    // partitions; range partitioning on (grp, ord) makes pid order == ord
    // order within every group
    val wOff = Window.partitionBy(col(grp)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__pid"), col(grp), col("__off"))
    val wRun = Window.partitionBy(col("__pid"), col(grp)).orderBy(col(ord))
    ranged
      .withColumn("__run", sum(col("__val")).over(wRun))
      .join(broadcast(offsets), Seq("__pid", grp))
      .withColumn(out, col("__run") + col("__off"))
      .drop("__val", "__pid", "__run", "__off")
  }

  /** Exact global rank (1..N) of every row under the lexicographic order of
    * `ord` — the scale-safe replacement for `row_number() over (order by
    * ...)`, whose empty-partition window funnels the WHOLE dataset through
    * one task. Same two-phase decomposition as [[groupedRunningSum]]: range
    * partition on the order key, count per partition (tiny), per-partition
    * offsets, within-partition row_number + offset. Every task is bounded
    * by the range-partition size at any N. `ord` must be a total order
    * (end it with a unique key) for a deterministic result.
    */
  def globalRank(df: DataFrame, ord: Seq[Column], out: String,
                 numPartitions: Int = 0): DataFrame = {
    require(ord.nonEmpty, "need at least one order column")
    val p = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // <= p rows: the per-partition counts and their running offsets
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wRun = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    ranged
      .withColumn("__rn", row_number().over(wRun).cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__rn") + col("__off"))
      .drop("__pid", "__rn", "__off")
  }
}
