package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver's contract: a flagship `entry` query, one `queries` entry per
  * implemented operator/query, and per-key DuckDB `oracleSql` for the
  * correctness gate. The 600 entries live in per-domain part files under
  * `graft.entry` (split from a single 33k-line monolith in round 4 — same
  * keys, same lambdas, same oracle strings); each part carries matched
  * `queries`/`oracles` maps and this facade is their concatenation.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  private val parts = Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])](
    (QueriesCore.queries, QueriesCore.oracles),
    (QueriesPipeline.queries, QueriesPipeline.oracles),
    (QueriesAnalytics1.queries, QueriesAnalytics1.oracles),
    (QueriesAnalytics2.queries, QueriesAnalytics2.oracles),
    (QueriesStats1.queries, QueriesStats1.oracles),
    (QueriesStats2.queries, QueriesStats2.oracles),
    (QueriesStats3.queries, QueriesStats3.oracles),
    (QueriesStats4.queries, QueriesStats4.oracles),
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    parts.iterator.map(_._1).reduce(_ ++ _)

  val oracleSql: Map[String, String] =
    parts.iterator.map(_._2).reduce(_ ++ _)
}
