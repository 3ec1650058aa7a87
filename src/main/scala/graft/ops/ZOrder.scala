package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two clustering
  * columns so that range-partitioning on the combined key co-locates rows
  * that are close in BOTH dimensions — the standard multi-dimensional
  * clustering trick for parquet file-skipping (min/max row-group stats
  * stay tight on every clustered column, not just the leading sort key).
  *
  * At 100 TB this is what turns "filter on (custkey range, price range)"
  * from a full scan into a handful of files: a lexicographic sort keeps
  * stats tight only on the first column; the z-curve keeps BOTH columns'
  * per-file spans O(n^-1/2) of the domain.
  *
  * The z-value is a pure bit-arithmetic expression (shifts/and/or), fully
  * codegen'd, and [[zValueSql]] renders the identical arithmetic for the
  * oracle.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** The identical interleave over SQL expressions, DuckDB dialect. */
  def zValueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")
  }

  /** Write `df` clustered on the z-curve of (`c1`, `c2`): each column is
    * linearly scaled to `bits`-bit cells over its [min, max] span (one
    * 1-row aggregate, broadcast back — no driver action), the combined
    * z-value range-partitions the data into `nFiles` output files, and
    * rows are sorted by z within each file so row-group stats are tight
    * too. Linear scaling assumes roughly uniform marginals; for heavy
    * skew, substitute rank-based binning upstream.
    */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
                  nFiles: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col(c1)).cast("double").as("__min1"),
      max(col(c1)).cast("double").as("__max1"),
      min(col(c2)).cast("double").as("__min2"),
      max(col(c2)).cast("double").as("__max2"))
    val cells = (1L << bits) - 1
    def scaled(c: String, lo: Column, hi: Column): Column =
      least(lit(cells), floor(
        (col(c).cast("double") - lo) / greatest(hi - lo, lit(1e-12))
          * cells).cast("long"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(
        scaled(c1, col("__min1"), col("__max1")),
        scaled(c2, col("__min2"), col("__max2")), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__min1", "__max1", "__min2", "__max2", "__z")
      .write.mode("overwrite").parquet(path)
  }
}
