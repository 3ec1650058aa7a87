package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (pre-partitioned, pre-sorted) table layout for shuffle-free
  * joins: both sides of a repeated equi-join are written hash-partitioned on
  * the join key into the same number of buckets, so the join needs NO
  * Exchange and NO Sort at read time — at 100 TB the dominant cost of a
  * fact-fact join is exactly that pair of shuffles, paid once at write time
  * here and amortized over every subsequent join.
  */
object Bucketing {

  /** Write `df` as a bucketed + sorted saved table. The frame is
    * repartitioned on the bucket key first: Spark's bucket file hash
    * (Murmur3 pmod nBuckets) matches repartition's hash partitioning, so
    * each task holds exactly one bucket and writes exactly ONE file — both
    * the small-files guard and the precondition for the reader to trust
    * per-bucket sort order (multi-file buckets lose the Sort elimination).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, col(key))
      .write.bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Equi-join of two same-bucketed tables: the scan of each side reports
    * hash output partitioning, so EnsureRequirements inserts no Exchange.
    * The within-partition Sort also disappears when
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` is on (safe with
    * this writer: exactly one file per bucket — the multi-file case that
    * made Spark 3.0 stop trusting bucket sort order by default can't
    * occur). BucketingSpec asserts both plan shapes.
    */
  def bucketedJoin(spark: SparkSession, left: String, leftKey: String,
                   right: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      col(leftKey) === col(rightKey))
}
