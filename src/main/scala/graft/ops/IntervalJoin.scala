package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join between two LARGE interval sets — the temporal
  * join Spark's built-ins can't express without a nested-loop plan.
  * (Contrast with the broadcast theta join, fine when one side is small,
  * and the as-of join, which matches points to the latest interval.)
  *
  * Formulation: every interval explodes to the fixed-width grid bins it
  * covers; the join becomes an EQUI-join on the bin id plus the overlap
  * predicate, so it shuffles both sides once on the bin key instead of
  * enumerating the cross product. An overlapping pair co-occurs in every
  * bin their spans share — to emit it exactly once WITHOUT a global
  * distinct, only the "responsibility bin" (the bin containing the
  * overlap's start, `greatest(startA, startB)`) keeps the pair; both
  * sides generated that bin by construction, and a `dropDuplicates`
  * shuffle never happens.
  *
  * At 100 TB: cost scales with sum(interval_length / binSize) replicated
  * rows plus the bin-key shuffle — pick `binSize` near the median
  * interval length so most intervals land in 1-2 bins. Dense hot bins
  * (everyone overlapping the same hour) are an inherent output-size
  * property, not a shuffle artifact; AQE splits oversized bin partitions.
  */
object IntervalJoin {

  /** Pairs of overlapping half-open intervals `[start, end)` — strict
    * overlap, touching intervals do NOT match. Bounds are non-negative
    * longs (epoch micros/seconds, positions, ...); empty or inverted
    * intervals (`end <= start`) are dropped. Column names must be
    * disjoint across the two inputs; the output carries both sides'
    * columns on each matched row.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    def binned(df: DataFrame, s: String, e: String, bin: String) =
      df.filter(col(e) > col(s) && col(s) >= 0)
        .withColumn(bin, explode(sequence(
          expr(s"$s div $binSize"), expr(s"($e - 1) div $binSize"))))
    val l = binned(left, lStart, lEnd, "__binL")
    val r = binned(right, rStart, rEnd, "__binR")
    l.join(r, col("__binL") === col("__binR") &&
        col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__binL") === expr(
          s"greatest($lStart, $rStart) div $binSize"))
      .drop("__binL", "__binR")
  }
}
