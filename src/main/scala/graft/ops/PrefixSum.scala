package graft.ops

import graft.Materialize.Ops
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
  * The ranged intermediate is marked with a LAZY materialize point
  * (`localCheckpoint(false)` at local defaults),
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
      .materialize
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
      .materialize
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
      .materialize
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
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val d = df.select(value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    // Round-8 rework: a full globalRank sorted EVERY range partition and
    // then paid a count scan plus an isin-filter scan over the whole
    // ranked relation — three passes where the pick only ever reads
    // <= 2·|ps| rows. Instead: range-partition once (lazy localCheckpoint
    // so the counts read and the pick read share one materialization and
    // one pid numbering, blocks freed by the ContextCleaner), read the
    // <= p per-partition counts back (a CONTRACT-bounded collect, same
    // class as the globalRank offsets), locate each target rank's owning
    // (partition, local index) driver-side, and sort ONLY the owning
    // partitions for the pick. Non-target partitions are never sorted.
    val ranged = d
      .repartitionByRange(p, col("__v"))
      .withColumn("__pid", spark_partition_id())
      .materialize
    val cnt = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = cnt.map(_._2).sum
    if (n == 0L)
      spark.range(1).select(
        outCols.map(c => lit(null).cast("double").as(c)): _*)
    else {
      val offsets = cnt.scanLeft((0, 0L, 0L)) { case ((_, off, tot), (pid, t)) =>
        (pid, off + tot, t)
      }.drop(1) // (pid, rows before it, its rows)
      val targets = ps.map { q =>
        val i = q * (n - 1)
        (math.floor(i).toLong + 1, math.ceil(i).toLong + 1, i)
      }
      val need = targets.flatMap(t => Seq(t._1, t._2)).distinct
      // rank -> (owning pid, 1-based local index)
      val where = need.map { r =>
        val (pid, off, _) = offsets.find { case (_, off, tot) =>
          r > off && r <= off + tot }.get
        r -> ((pid, r - off))
      }.toMap
      val pids = where.values.map(_._1).toSeq.distinct
      val wRun = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      val pred = where.values.toSeq.distinct
        .map { case (pid, li) =>
          col("__pid") === pid && col("__lrn") === li }
        .reduce(_ || _)
      val picked = ranged.filter(col("__pid").isin(pids: _*))
        .withColumn("__lrn", row_number().over(wRun).cast("long"))
        .filter(pred)
        .select(col("__pid"), col("__lrn"), col("__v")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val byRank = where.map { case (r, loc) => r -> picked(loc) }
      val cols = ps.indices.map { k =>
        val (lo, hi, i) = targets(k)
        // the builtin's exact composition: the value when the position is
        // integral OR when both bracketing ranks land on the same value
        // (the builtin returns lowerKey without interpolating there —
        // blending v*wl + v*wh can drift an ulp); else the SYMMETRIC
        // blend (higher-pos)*loVal + (pos-lower)*hiVal, same terms,
        // bit-identical results
        val v = if (lo == hi || byRank(lo) == byRank(hi)) byRank(lo)
          else (math.ceil(i) - i) * byRank(lo) +
            (i - math.floor(i)) * byRank(hi)
        lit(v).as(outCols(k))
      }
      spark.range(1).select(cols: _*)
    }
  }

  /** Per-group [[exactPercentiles]]: one row per `grp` value with
    * `outCols`, bit-identical to `percentile()` on double inputs, fully
    * declarative (no driver reads). Same two-phase decomposition as
    * [[groupedRunningSum]] (every task bounded by the range-partition
    * size regardless of group sizes), INLINED so the per-(partition,
    * group) totals aggregate also yields the group counts, the counts
    * yield each percentile's two target global ranks, and the running
    * offsets map each target to its owning (partition, local index) —
    * every operand but the ranged relation itself is <= partitions x
    * groups rows, and the big relation is scanned exactly twice
    * (totals, then one within-partition row_number pass joined against
    * the tiny pick relation). The pick join is planner-chosen: broadcast
    * when |groups| is small (every gallery use), sort-merge when
    * |groups| itself is data-sized — the SMJ case re-shuffles the ranked
    * rows by the join key, where a skewed group is AQE skew-split for
    * the merge (the join streams rows, it never buffers a group). No
    * hint on purpose: forcing broadcast would pin a driver-OOM plan when
    * groups grow with the data (ScaleChecks check 1 rationale).
    * Divergences from the builtin's row semantics (values are
    * bit-identical): groups whose values are all NULL are absent from
    * the result, and rows whose GROUP KEY is NULL are dropped (the pick
    * join is a null-dropping equi-join) where `groupBy` would keep a
    * null group — filter or coalesce null keys upstream if that group
    * matters.
    */
  def groupedExactPercentiles(df: DataFrame, grp: String, value: Column,
                              ps: Seq[Double], outCols: Seq[String],
                              numPartitions: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.length == outCols.length,
      "one output column per requested percentile")
    require(ps.forall(q => q >= 0.0 && q <= 1.0), "percentiles in [0, 1]")
    val p = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val d = df.select(col(grp), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    // The two-phase decomposition INLINED (round 8): a generic
    // groupedRunningSum would rank every row and then pay two more full
    // scans (a count aggregate and a 4·|ps|-expression bracket aggregate
    // over the whole relation). Percentiles only ever read <= 2·|ps|
    // ranks per group, so instead: the per-(partition, group) totals
    // aggregate — which the rank decomposition needs anyway — also yields
    // the group counts, the counts yield the target GLOBAL ranks, the
    // running offsets map each target to its owning (partition, local
    // index), and one within-partition row_number pass joins against that
    // tiny pick relation. One materialization of the ranged relation, ONE
    // full window pass, and every other operand is <= partitions x groups
    // rows. Ties need no uid tie-breaker: row_number's arbitrary order
    // among equal values picks an identical VALUE for any rank inside a
    // tie run (bit-identical output, spec-pinned against the builtin).
    val ranged = d
      .repartitionByRange(p, col(grp), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .materialize
    val totals = ranged.groupBy(col("__pid"), col(grp))
      .agg(count(lit(1)).as("__tot"))
    val wOff = Window.partitionBy(col(grp)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
    val cnts = totals.groupBy(col(grp)).agg(sum(col("__tot")).as("__n"))
    // one row per (group, percentile, bracket side): the global rank to
    // pick — zero-based index i = p*(n-1), ranks floor(i)+1 / ceil(i)+1
    val targets = cnts.select(col(grp),
        explode(array(ps.indices.flatMap { k =>
          val i = lit(ps(k)) * (col("__n") - lit(1L)).cast("double")
          Seq(struct(lit(k).as("__k"), lit(true).as("__isLo"),
                (floor(i).cast("long") + 1).as("__rank")),
              struct(lit(k).as("__k"), lit(false).as("__isLo"),
                (ceil(i).cast("long") + 1).as("__rank")))
        }: _*)).as("__t"))
      .select(col(grp), col("__t.__k").as("__k"),
        col("__t.__isLo").as("__isLo"), col("__t.__rank").as("__rank"))
    // owning partition + local index per target (tiny x tiny join)
    val pick = targets.join(offsets, Seq(grp))
      .filter(col("__rank") > col("__off") &&
        col("__rank") <= col("__off") + col("__tot"))
      .select(col("__pid"), col(grp), col("__k"), col("__isLo"),
        (col("__rank") - col("__off")).as("__lrn"))
    // the one full pass: within-partition row_number, then the pick join
    // (planner-chosen side strategy — pick is aggregate-reduced, so it
    // broadcasts when groups are few and sort-merges when |groups| is
    // data-sized, same contract as the old count join-back)
    val wRun = Window.partitionBy(col("__pid"), col(grp)).orderBy(col("__v"))
    val picked = ranged
      .withColumn("__lrn", row_number().over(wRun).cast("long"))
      .join(pick, Seq("__pid", grp, "__lrn"))
    val aggs = ps.indices.flatMap { k =>
      Seq(
        max(when(col("__k") === k && col("__isLo"), col("__v")))
          .as(s"__lo$k"),
        max(when(col("__k") === k && !col("__isLo"), col("__v")))
          .as(s"__hi$k"))
    }
    // <= 2·|ps| rows per group reach this aggregate; the blend weights
    // come from the group count, kept VERBATIM from the builtin's
    // composition so results stay bit-identical
    picked.groupBy(col(grp)).agg(aggs.head, aggs.tail: _*)
      .join(cnts, Seq(grp))
      .select(col(grp) +: ps.indices.map { k =>
        val i = lit(ps(k)) * (col("__n") - lit(1L)).cast("double")
        val wl = ceil(i).cast("double") - i
        val wh = i - floor(i).cast("double")
        // two short-circuits, both the builtin's: integral position (one
        // bracketing rank), and EQUAL bracketing values — the builtin
        // returns lowerKey without interpolating when both ranks land in
        // the same value's count run; blending v*wl + v*wh instead can
        // drift an ulp when the position is fractional (caught by the
        // randomized parity property, round 8). NaN brackets fall through
        // to the blend and propagate, like the builtin.
        when((wl === 0.0 && wh === 0.0) || col(s"__lo$k") === col(s"__hi$k"),
            col(s"__lo$k"))
          .otherwise(wl * col(s"__lo$k") + wh * col(s"__hi$k"))
          .as(outCols(k))
      }: _*)
  }
}
