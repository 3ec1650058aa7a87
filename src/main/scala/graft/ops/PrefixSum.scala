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
  *
  * The ranged intermediate is marked with a LAZY `localCheckpoint(false)`,
  * not `persist`: partition ids must be IDENTICAL between the totals
  * read and the final window read (a re-sampled range repartition could
  * silently renumber them). Both reads share the one marked RDD — the
  * first job to touch it materializes and truncates its lineage, pinning
  * the pids for every later read, with no extra eager job up front — and
  * its blocks are cleaned by the ContextCleaner as soon as the result
  * DataFrame goes unreachable. A `persist` here is registered with the
  * CacheManager and never freed without an explicit unpersist, which
  * across a 600-query sweep accumulates until LRU eviction. Trade-off:
  * a lost executor fails the job loudly (retry) instead of recomputing —
  * fail-loud beats a silent pid renumbering.
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
      .localCheckpoint(false)
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

  /** Multi-column [[groupedRunningSum]]: N running sums in ONE two-phase
    * pass (one range partition, one totals aggregate, one within-partition
    * window) instead of N chained passes — the difference between one and
    * four shuffles+persists when a query needs several aligned prefix sums
    * over the same (grp, ord) spine. Each `(value, out)` pair must be
    * integral; semantics per column are identical to the single version.
    */
  def groupedRunningSums(df: DataFrame, grp: String, ord: String,
                         values: Seq[(Column, String)],
                         numPartitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "need at least one (value, out) pair")
    val p = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val vals = values.indices.map(i => s"__val$i")
    val pre = values.zip(vals).foldLeft(df) { case (d, ((v, _), c)) =>
      d.withColumn(c, v.cast("long"))
    }
    val ranged = pre
      .repartitionByRange(p, col(grp), col(ord))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val totAggs = vals.map(c => sum(col(c)).as(s"__tot$c"))
    val totals = ranged.groupBy(col("__pid"), col(grp))
      .agg(totAggs.head, totAggs.tail: _*)
    val wOff = Window.partitionBy(col(grp)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(Seq(col("__pid"), col(grp)) ++
      vals.map(c => coalesce(sum(col(s"__tot$c")).over(wOff), lit(0L))
        .as(s"__off$c")): _*)
    val wRun = Window.partitionBy(col("__pid"), col(grp)).orderBy(col(ord))
    val withRuns = vals.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"__run$c", sum(col(c)).over(wRun))
    }
    val joined = withRuns.join(broadcast(offsets), Seq("__pid", grp))
    val withOuts = values.zip(vals).foldLeft(joined) {
      case (d, ((_, out), c)) =>
        d.withColumn(out, col(s"__run$c") + col(s"__off$c"))
    }
    vals.foldLeft(withOuts.drop("__pid")) { (d, c) =>
      d.drop(c, s"__run$c", s"__off$c")
    }
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
      .localCheckpoint(false)
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
