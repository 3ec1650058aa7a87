package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining: count length-n runs of consecutive values
  * per key in event-time order — the behavioral n-gram pass ("view →
  * click → purchase") that complements the token-space collocations in
  * [[Collocations]].
  *
  * Shape: ONE window shuffle on the key materializes each run via chained
  * lead()s (no collect_list — per-task memory is the window frame, never
  * the whole key group), then runs collapse to partial-aggregated counts;
  * the total re-aggregates the bounded n-gram table and broadcasts back.
  */
object Sequence {

  /** Count n-grams of `valCol` per `keyCol`, ordered by (`tsCol`,
    * `tieCol`) — the tie column must make the order total or the run
    * extraction is nondeterministic. Returns (e1..en, cnt, share) with
    * share rounded to 6 dp.
    */
  def ngramCounts(df: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, valCol: String, n: Int): DataFrame = {
    require(n >= 2, "n-gram length must be >= 2")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val steps = (1 until n).map(i => lead(col(valCol), i).over(w).as(s"e${i + 1}"))
    val runs = df.select((col(valCol).as("e1") +: steps): _*)
      .filter((2 to n).map(i => col(s"e$i").isNotNull).reduce(_ && _))
    val gramCols = (1 to n).map(i => col(s"e$i"))
    val counts = runs.groupBy(gramCols: _*).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(gramCols ++ Seq(col("cnt"),
        round(col("cnt").cast("double") / col("__total"), 6).as("share")): _*)
  }
}
