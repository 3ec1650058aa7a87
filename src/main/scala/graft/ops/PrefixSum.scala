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

  /** Exact percentile(s) of `value` with `percentile()`'s linear
    * interpolation (sorted x, zero-based index i = p*(n-1), result =
    * x[⌊i⌋] + (i−⌊i⌋)·(x[⌊i⌋+1] − x[⌊i⌋])) — returned as ONE 1-row frame
    * with `outCols`, bit-identical to the builtin on double inputs.
    *
    * The builtin `percentile()` aggregate buffers a value→COUNT map in
    * one task — bounded by DISTINCT values, so it is the right (and
    * 2-4x cheaper, measured at f30) tool for discrete domains: integer
    * day gaps, price grids, calendar series. On a CONTINUOUS value
    * domain (ratios, scores, measurements) distinct ≈ rows and that map
    * is a single-task memory bomb at corpus scale. This is the
    * continuous-domain replacement: a [[globalRank]] over the values
    * (every task bounded by the range-partition size at any n), then
    * ONLY the <= 2·|ps| bracketing rows are read back — a
    * CONTRACT-bounded collect, same class as a stat fold. NULLs are
    * excluded, matching the aggregate.
    */
  def exactPercentiles(df: DataFrame, value: Column, ps: Seq[Double],
                       outCols: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == outCols.length,
      "one output column per requested percentile")
    require(ps.forall(q => q >= 0.0 && q <= 1.0), "percentiles in [0, 1]")
    val spark = df.sparkSession
    val d = df.select(value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = globalRank(d, Seq(col("__v")), "__r")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: if the count or the bracket collect throws, the cached
    // blocks must still deregister — an exception path that leaks a
    // CacheManager entry is exactly the accumulation the class doc warns
    // about across a 600-query sweep
    try {
    val n = ranked.count()
    val result =
      if (n == 0L)
        spark.range(1).select(
          outCols.map(c => lit(null).cast("double").as(c)): _*)
      else {
        val targets = ps.map { q =>
          val i = q * (n - 1)
          (math.floor(i).toLong + 1, math.ceil(i).toLong + 1, i)
        }
        val need = targets.flatMap(t => Seq(t._1, t._2)).distinct
        val picked = ranked.filter(col("__r").isin(need: _*))
          .select(col("__r"), col("__v")).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val cols = ps.indices.map { k =>
          val (lo, hi, i) = targets(k)
          // the builtin's exact composition: value when the position is
          // integral, else the SYMMETRIC blend (higher-pos)*loVal +
          // (pos-lower)*hiVal — same terms, bit-identical results
          val v = if (lo == hi) picked(lo)
            else (math.ceil(i) - i) * picked(lo) +
              (i - math.floor(i)) * picked(hi)
          lit(v).as(outCols(k))
        }
        spark.range(1).select(cols: _*)
      }
    result
    } finally { ranked.unpersist(); () }
  }

  /** Per-group [[exactPercentiles]]: one row per `grp` value with
    * `outCols`, bit-identical to `percentile()` on double inputs, fully
    * declarative (no driver reads). Within-group ranks come from the
    * [[groupedRunningSum]] two-phase decomposition (every task bounded by
    * the range-partition size regardless of group sizes), group counts
    * join back on the group key, and each percentile is composed from the
    * two bracketing ranks with when-filtered max aggregates — all
    * map-side-combinable, so the group-keyed AGGREGATE shuffle carries
    * only |groups| x |ps| partial buffers. The count join-back is
    * planner-chosen: broadcast when |groups| is small (every gallery
    * use), sort-merge when |groups| itself is data-sized — the SMJ case
    * re-shuffles `ranked` by group key, where a skewed group is AQE
    * skew-split for the merge (the join streams rows, it never buffers a
    * group). No hint on purpose: forcing broadcast would pin a
    * driver-OOM plan when groups grow with the data (ScaleChecks check 1
    * rationale). Divergences from the builtin's row
    * semantics (values are bit-identical): groups whose values are all
    * NULL are absent from the result, and rows whose GROUP KEY is NULL
    * are dropped (the count join is a null-dropping equi-join) where
    * `groupBy` would keep a null group — filter or coalesce null keys
    * upstream if that group matters.
    */
  def groupedExactPercentiles(df: DataFrame, grp: String, value: Column,
                              ps: Seq[Double], outCols: Seq[String],
                              numPartitions: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.length == outCols.length,
      "one output column per requested percentile")
    require(ps.forall(q => q >= 0.0 && q <= 1.0), "percentiles in [0, 1]")
    val d = df.select(col(grp), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      // unique within-group order even under ties: (v, uid)
      .withColumn("__ok", struct(col("__v"), monotonically_increasing_id()))
    // lazy localCheckpoint, not persist: same rationale as the class doc —
    // two reads (counts + brackets) share one materialization, and blocks
    // free with the result instead of accumulating in the CacheManager
    val ranked = groupedRunningSum(d, grp, "__ok", lit(1L), "__r",
      numPartitions).localCheckpoint(false)
    val cnts = ranked.groupBy(col(grp)).agg(max(col("__r")).as("__n"))
    val j = ranked.join(cnts, Seq(grp))
    val aggs = ps.indices.flatMap { k =>
      // zero-based index i = p*(n-1), per group via the joined count
      val i = lit(ps(k)) * (col("__n") - lit(1L)).cast("double")
      Seq(
        max(when(col("__r") === floor(i).cast("long") + 1, col("__v")))
          .as(s"__lo$k"),
        max(when(col("__r") === ceil(i).cast("long") + 1, col("__v")))
          .as(s"__hi$k"),
        // the builtin's symmetric blend terms, kept verbatim so results
        // are bit-identical: (higher-pos) and (pos-lower)
        max(ceil(i).cast("double") - i).as(s"__wl$k"),
        max(i - floor(i).cast("double")).as(s"__wh$k"))
    }
    j.groupBy(col(grp)).agg(aggs.head, aggs.tail: _*)
      .select(col(grp) +: ps.indices.map { k =>
        // integral position (both weights exactly 0, i.e. one bracketing
        // rank) -> the value, like the builtin; else the symmetric blend
        when(col(s"__wl$k") === 0.0 && col(s"__wh$k") === 0.0,
            col(s"__lo$k"))
          .otherwise(col(s"__wl$k") * col(s"__lo$k") +
            col(s"__wh$k") * col(s"__hi$k"))
          .as(outCols(k))
      }: _*)
  }
}
