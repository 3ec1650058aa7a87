package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-key outlier detection on a numeric column via the median /
  * MAD (median absolute deviation) rule: a row is an outlier when
  * |x - median| > z * 1.4826 * MAD. Unlike mean/stddev z-scores, the
  * median and MAD are themselves immune to the outliers being hunted —
  * the standard data-quality screen for metric columns (latency spikes,
  * corrupted numeric fields, sensor glitches) before training-data use.
  *
  * Shape: two aggregation passes over the keyed column (median, then
  * median of deviations) plus one equi-join of the tiny per-key stats
  * back onto the rows — the stats side is |keys| rows and broadcasts.
  * CONTRACT: `keyCol` must be low-cardinality (segments, event types,
  * status codes — thousands at most). The stats relation is explicitly
  * broadcast, so a high-cardinality key (user ids) would materialize
  * O(|keys|) rows on the driver; key per-entity screens on a plain join
  * instead (drop the hint) or pre-aggregate per entity.
  * `approx = true` swaps exact `median` for `approx_percentile`: the
  * exact percentile aggregate buffers each group's values (fine for
  * bounded groups, the oracle compares it); the approx one holds
  * constant sketch state per group, which is the 100 TB path — same
  * trade as the q44/q55 percentile pair.
  */
object Outliers {

  private val MadToSigma = 1.4826 // 1/Phi^-1(3/4): MAD -> stddev under normality

  /** Returns `df` plus (med, mad, abs_dev, is_outlier) computed per
    * `keyCol` group over `valCol`. Rows with NULL `valCol` get
    * is_outlier = false and NULL abs_dev.
    */
  def madFlag(df: DataFrame, keyCol: String, valCol: String,
              z: Double = 3.0, approx: Boolean = false): DataFrame = {
    def med(c: String) =
      if (approx) expr(s"approx_percentile($c, 0.5, 10000)")
      else expr(s"median($c)")
    val medians = df.groupBy(col(keyCol)).agg(med(valCol).as("med"))
    val dev = df.join(broadcast(medians), Seq(keyCol))
      .withColumn("abs_dev", abs(col(valCol) - col("med")))
    val mads = dev.groupBy(col(keyCol)).agg(med("abs_dev").as("mad"))
    dev.join(broadcast(mads), Seq(keyCol))
      .withColumn("is_outlier",
        coalesce(col("abs_dev") > lit(z * MadToSigma) * col("mad"), lit(false)))
  }

  /** Winsorized and trimmed means per key — the tail-robust location
    * estimates that complement [[madFlag]]'s row-level screen: winsorizing
    * CLAMPS values into the [pLo, pHi] exact-percentile band (every row
    * still counts), trimming DROPS rows outside it. One percentile
    * aggregate for both cut points (single buffer per group, the q44
    * trade), broadcast join back, then one plain aggregate — two passes
    * total, both partial-agg'd. Means rounded to 4 dp.
    */
  def winsorizedStats(df: DataFrame, keyCol: String, valCol: String,
                      pLo: Double = 0.1, pHi: Double = 0.9): DataFrame = {
    require(pLo < pHi, "pLo must be below pHi")
    val cuts = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, array(${pLo}D, ${pHi}D))").as("__ps"))
      .select(col(keyCol), element_at(col("__ps"), 1).as("__lo"),
        element_at(col("__ps"), 2).as("__hi"))
    df.join(broadcast(cuts), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(col(valCol)).as("n"),
        round(avg(col(valCol)), 4).as("mean"),
        round(avg(greatest(least(col(valCol), col("__hi")), col("__lo"))), 4)
          .as("wins_mean"),
        round(avg(when(col(valCol).between(col("__lo"), col("__hi")),
          col(valCol))), 4).as("trim_mean"),
        sum(when(col(valCol).between(col("__lo"), col("__hi")), 1L)
          .otherwise(0L)).as("trim_n"),
        round(max(col("__lo")), 4).as("p_lo"),
        round(max(col("__hi")), 4).as("p_hi"))
  }
}
