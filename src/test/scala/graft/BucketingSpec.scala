package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Bucketing

/** The point of bucketing is the PLAN, not the result: a join of two tables
  * bucketed on their join key must need no Exchange and no Sort. The result
  * itself is cross-checked against the plain (shuffled) join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plans with no Exchange and no Sort, result matches") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_mktsegment")
    Bucketing.writeBucketed(orders, "bspec_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "bspec_customer", "c_custkey", 8)

    // each bucket must be exactly one file or the reader drops the sort order
    val whBase = new java.io.File(TestSpark.warehouse)
    val filesPerTable = Seq("bspec_orders", "bspec_customer").map { t =>
      new java.io.File(whBase, t).listFiles()
        .count(f => f.getName.startsWith("part-"))
    }
    assert(filesPerTable == Seq(8, 8), s"one file per bucket: $filesPerTable")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: a broadcast join would trivially have no
      // exchange and prove nothing about the bucketed layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.bucketedJoin(spark, "bspec_orders", "o_custkey",
        "bspec_customer", "c_custkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")

      // the per-bucket sort in the files is only TRUSTED by the reader under
      // the legacy conf (since Spark 3.0 multi-file buckets made it unsafe
      // by default); with it on — valid here, one file per bucket — the
      // plan drops the Sort too
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val js = Bucketing.bucketedJoin(spark, "bspec_orders", "o_custkey",
        "bspec_customer", "c_custkey")
      val sortedPlan = js.queryExecution.executedPlan.toString
      assert(!sortedPlan.contains("Sort "),
        s"bucketed join re-sorted despite sorted single-file buckets:\n$sortedPlan")

      val bucketed = j.groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val plain = orders.join(customer, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS bspec_orders")
      spark.sql("DROP TABLE IF EXISTS bspec_customer")
    }
  }
}
