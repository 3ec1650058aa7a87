package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis: how many users reach each stage of
  * an event sequence, where stage k counts only if it happens strictly
  * after the user's stage-(k-1) completion — the product-analytics staple
  * (view -> click -> purchase).
  *
  * Scale shape: stage k is one filtered aggregate over events joined to
  * the stage-(k-1) completion relation on the user key. The completion
  * relations are one row per qualifying user (monotonically shrinking);
  * the events side is filtered to ONE event type before the join, so each
  * pass shuffles a thin slice, and the number of passes is the (small,
  * fixed) funnel depth — never a per-user sort of the whole log.
  */
object Funnel {

  /** Completion times: one row per user per deepest-reached stage prefix.
    * Returns (user, stage_idx, stage_name, stage_ts) with stage_idx 1-based;
    * a user appears for every stage they reached.
    */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String],
                 maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("stage_ts"))
      .select(col(userCol), lit(1L).as("stage_idx"),
        lit(stages.head).as("stage_name"), col("stage_ts"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val prev = acc.filter(col("stage_idx") === i.toLong)
        .select(col(userCol), col("stage_ts").as("__prev_ts"))
      // within-window variant: the stage must land inside
      // (prev, prev + gap] — epoch-double arithmetic, exact at micros
      val inWindow = maxGapSeconds.fold(lit(true))(g =>
        col(tsCol).cast("double") <= col("__prev_ts").cast("double") + g)
      val next = events.filter(col(typeCol) === st)
        .join(prev, Seq(userCol))
        .filter(col(tsCol) > col("__prev_ts") && inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("stage_ts"))
        .select(col(userCol), lit((i + 1).toLong).as("stage_idx"),
          lit(st).as("stage_name"), col("stage_ts"))
      acc.unionByName(next)
    }
  }

  /** Funnel summary: per stage, the user count and the mean seconds from
    * the previous stage (null for stage 1), rounded to 2 dp.
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String],
                   maxGapSeconds: Option[Long] = None): DataFrame = {
    val times = stageTimes(events, userCol, tsCol, typeCol, stages,
      maxGapSeconds)
    val prev = times.select(col(userCol), (col("stage_idx") + 1).as("stage_idx"),
      col("stage_ts").as("__prev_ts"))
    times.join(prev, Seq(userCol, "stage_idx"), "left")
      .groupBy(col("stage_idx"), col("stage_name"))
      .agg(count(lit(1)).as("n_users"),
        round(avg(col("stage_ts").cast("double") -
          col("__prev_ts").cast("double")), 2).as("avg_secs_from_prev"))
      .orderBy(col("stage_idx"))
  }
}
