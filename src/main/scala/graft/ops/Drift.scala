package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two snapshots of a corpus —
  * the monitoring step that catches a broken upstream feed (unit change,
  * truncation, silent filter) before a bad batch trains. The metric is
  * PSI (population stability index): histogram both snapshots on a fixed
  * binning, then sum (p - q) * ln(p / q) over bins. Conventional reading:
  * < 0.1 stable, 0.1-0.25 drifting, > 0.25 broken.
  *
  * Shape: the two sides are unioned with a side tag and aggregated
  * TWICE, both with map-side partials — (key, bin) counts per side, then
  * the per-key PSI sum over its <= nBins rows. No join, two small
  * shuffles; at 100 TB the first shuffle is |keys| x nBins x 2 rows.
  * Bin counts are Laplace-smoothed ((c + 0.5) / (n + nBins/2)) so an
  * empty bin on one side contributes a finite, defined term instead of
  * ln(0).
  */
object Drift {

  /** PSI of `cur` vs `ref` over `valCol`, histogrammed into `nBins`
    * fixed-width bins of `binWidth` (values beyond the last bin clamp
    * into it; NULLs are dropped). Returns one row per `keyCol` value:
    * (key, n_ref, n_cur, psi).
    */
  def psi(ref: DataFrame, cur: DataFrame, keyCol: String, valCol: String,
          binWidth: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && binWidth > 0, "need >= 2 bins of positive width")
    def binned(df: DataFrame, side: Int) =
      df.filter(col(valCol).isNotNull)
        .select(col(keyCol).as("__k"),
          greatest(least(floor(col(valCol) / lit(binWidth)), lit(nBins - 1)),
            lit(0)).cast("int").as("__bin"),
          lit(side).as("__side"))
    def share(cnt: Column, n: Column): Column =
      (cnt + lit(0.5)) / (n + lit(nBins * 0.5))
    binned(ref, 0).unionAll(binned(cur, 1))
      .groupBy(col("__k"), col("__bin"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__cr"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cc"))
      .withColumn("__nr", sum(col("__cr")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))))
      .withColumn("__nc", sum(col("__cc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))))
      .select(col("__k"),
        col("__cr"), col("__cc"), col("__nr"), col("__nc"),
        ((share(col("__cr"), col("__nr")) - share(col("__cc"), col("__nc"))) *
          log(share(col("__cr"), col("__nr")) / share(col("__cc"), col("__nc"))))
          .as("__term"))
      .groupBy(col("__k").as(keyCol))
      .agg(min(col("__nr")).as("n_ref"), min(col("__nc")).as("n_cur"),
        sum(col("__term")).as("psi"))
  }
}
