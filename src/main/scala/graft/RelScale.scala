package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational scale-up generator: replicates the scale-GROWING TPC-H-side
  * tables (`customer supplier part orders lineitem`) `factor`-ways with
  * per-replica key offsets, producing a directory with the exact layout the
  * engine's table reader expects — so every SparkEntry query, Bench, and
  * WindowAudit run UNCHANGED against a corpus `factor`× the stock sf0.1.
  *
  * Offsets keep referential integrity: replica r of every table shifts each
  * join key k by `r * (max(k over the base table) + 1)`, with the SAME step
  * used on both sides of each foreign key (l_orderkey ↔ o_orderkey,
  * o_custkey ↔ c_custkey, l_partkey ↔ p_partkey, l_suppkey ↔ s_suppkey).
  * The scaled dataset is therefore `factor` disjoint copies of the base:
  * per-key join and group results replicate exactly `factor`×, global
  * key-group cardinalities grow `factor`×, and value distributions (dates,
  * quantities, prices, flags) are untouched — i.e. the same shape a larger
  * TPC-H sf generates, minus new key entropy in the value columns.
  *
  * Static tables (`region nation`) and the non-relational corpora
  * (`events documents embeddings` — already covered by graft.Stress at
  * 100–500×) are copied as-is so the full Bench warmup and any
  * mixed-family query still resolve.
  *
  * Why this exists: every scale probe before round 6 targeted the LLM-ops
  * families (dedup/ANN/graph/streaming at 100–500×); the relational core's
  * 100 TB evidence was plan-shape auditing at sf0.01/sf0.1 only. This
  * generator turns "the 47 planner-chosen broadcasts flip to shuffle joins
  * at scale, and the relational plans are linear in sf" from an assertion
  * into a measured growth curve (BENCH_NOTES_r6 §7).
  *
  * Usage: runMain graft.RelScale <srcSfDir> <outDir> <factor>
  */
object RelScale {

  /** (table, key column -> step-source table) for the growing tables.
    * Steps are derived from the BASE table that owns the key, so both
    * sides of each FK shift identically.
    */
  private val keyOwners: Map[String, String] = Map(
    "o_orderkey" -> "orders", "l_orderkey" -> "orders",
    "c_custkey" -> "customer", "o_custkey" -> "customer",
    "p_partkey" -> "part", "l_partkey" -> "part",
    "s_suppkey" -> "supplier", "l_suppkey" -> "supplier")

  private val growing = Seq("customer", "supplier", "part", "orders", "lineitem")
  private val copied  = Seq("region", "nation", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/relscale-f10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-relscale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

    // one step per key-owning table: max(ownKey) + 1 over the base
    val steps: Map[String, Long] = Map(
      "orders" -> "o_orderkey", "customer" -> "c_custkey",
      "part" -> "p_partkey", "supplier" -> "s_suppkey").map {
      case (t, k) => t -> (base(t).agg(max(col(k))).head.getLong(0) + 1L)
    }

    growing.foreach { t =>
      val b = base(t)
      val reps = spark.range(factor).select(col("id").as("__rep"))
      val scaled = b.crossJoin(reps).select(b.columns.map { c =>
        keyOwners.get(c) match {
          case Some(owner) =>
            (col(c) + col("__rep") * lit(steps(owner))).as(c)
          case None => col(c)
        }
      }.toIndexedSeq: _*)
      // enough write partitions that the scaled fact tables read back
      // parallel (the base files are single driver-written parquet files)
      val parts = math.max(4, math.min(64, factor * 2))
      scaled.repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[relscale] $t x$factor -> ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    copied.foreach { t =>
      base(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[relscale] $t copied")
    }
    spark.stop()
  }
}
