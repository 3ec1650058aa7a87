package graft

import org.apache.spark.sql.functions._

/** Temporary diagnostic: HITS / labelPropagate stage timing at stress scale. */
object ProbeHits {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "probe-hits")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val replicas = spark.range(factor).select(col("id").as("rep"))
    val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
    val gedges = {
      val exp = ev0.crossJoin(replicas).select(
        (col("user_id") * factor + col("rep")).as("u"),
        col("event_id"),
        (col("item") + col("rep") * lit(100L)).as("item"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("u")).orderBy(col("event_id"))
      exp.withColumn("src", lag(col("item"), 1).over(w))
        .filter(col("src").isNotNull && col("src") =!= col("item"))
        .groupBy(col("src"), col("item").as("dst"))
        .agg(count(lit(1)).cast("double").as("w"))
        .persist()
    }
    println(s"[probe] edges: ${gedges.count()}")
    val e2 = gedges.select(col("src"), col("dst"))
    t("hits_e_distinct") {
      e2.filter(col("src").isNotNull && col("dst").isNotNull).distinct().count()
    }
    t("hits_3it_total") { graft.ops.Graph.hits(e2, nIter = 3).count() }
    val seeds = gedges.select(col("src").as("id")).distinct()
      .filter(pmod(col("id"), lit(3)) === 0)
      .select(col("id"), concat(lit("l"), pmod(col("id"), lit(5))).as("label"))
    t("lp_seeds") { seeds.count() }
    t("lp_2it_total") {
      graft.ops.Graph.labelPropagate(e2, seeds, nIter = 2).count()
    }
    spark.stop()
  }
}
