package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Round-9 measurement (VERDICT r8 Next #2): the one-time BHJ→SMJ join
  * transitions adjudicated at f30/f60 (q05/q307/q416/q513 in r7, q451 in
  * r8) carry the standing ASSERTION "on a real cluster AQE owns this
  * flip" — asserted, never observed. This probe runs each transition
  * query at its transition scale and records, from the executed adaptive
  * plan itself, who actually chose the join:
  *
  *   - static: the planner's join picks with AQE OFF (plan-only — the
  *     choice the cost model makes from file statistics);
  *   - adaptive: the FINAL executed plan's join picks after running with
  *     AQE ON (the engine default), i.e. what the runtime statistics
  *     chose;
  *   - re-planned: whether the two MULTISETS disagree — a plan-SHAPE
  *     diff, not yet proof of a strategy conversion: adaptive execution
  *     INSTANTIATES subtrees the static render serves via reuse, so the
  *     node count can change with every join keeping its strategy
  *     (q451 at f30 does exactly this — same SMJ/BHJ on the same keys,
  *     5 nodes vs 3). On a `replanned=true`, run with
  *     GRAFT_AQE_EXPLAIN=1 and attribute the diff in the dumped plans
  *     before claiming AQE converted anything.
  *
  * Run it twice per the verdict protocol: under local[16] and under
  * spark-submit against the 2-executor standalone master (GraftSession
  * honors spark.master), where AQE's runtime shuffle statistics are real
  * serialized exchanges. The cross-JVM CPU ratio at the flip point is the
  * "does the transition degrade >1.5×" check.
  *
  * Usage: runMain graft.AqeProbe [sfDir] [queryCsv] [repeat]
  */
object AqeProbe {

  /** Multiset of join-node kinds in a physical plan, adaptive-aware: for
    * an executed AdaptiveSparkPlanExec this walks the FINAL plan.
    */
  def joinKinds(p: SparkPlan): Seq[String] = {
    val kinds = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(n: SparkPlan): Unit = {
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
          val k = n.nodeName
          if (k.contains("Join")) kinds += k.replaceAll("Exec$", "")
          n.children.foreach(walk)
          n.subqueries.foreach(walk)
      }
      ()
    }
    walk(p)
    kinds.sorted.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/relscale_f30")
    val queries = args.lift(1).getOrElse(
      "q05_join5_agg,q307_gravity_model,q416_mixture_em," +
        "q513_fisher_index,q451_pvm_variance").split(",").toSeq
    val repeat = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val wh = java.nio.file.Files.createTempDirectory("graft-aqe-wh").toString
    val spark = GraftSession.hiveBuilder(s"local[$cpus]", "graft-aqe-probe", wh)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new org.apache.spark.graft.BenchMetrics(spark.sparkContext)
    println(s"[aqe-probe] master=${spark.sparkContext.master} sf=$sfDir")
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000000).selectExpr("sum(id) as s").collect()

    for (name <- queries) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // static pick: plan-only under AQE OFF (the cost model's view of
      // the same file statistics — no execution, the choice is what we
      // are recording)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val staticJoins = joinKinds(fn(spark, sfDir).queryExecution.executedPlan)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // adaptive: EXECUTE, then read the final plan (isFinalPlan only
      // materializes once the run finishes) + executor CPU
      var finalJoins: Seq[String] = Nil
      val cpu = (1 to repeat).map { _ =>
        val c0 = meter.cpuSeconds()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        finalJoins = joinKinds(df.queryExecution.executedPlan)
        GraftSession.dropQueryState(spark)
        meter.cpuSeconds() - c0
      }.min
      val replanned = staticJoins != finalJoins
      println(s"[aqe-probe] $name static=${staticJoins.mkString("+")} " +
        s"final=${finalJoins.mkString("+")} replanned=$replanned " +
        f"cpu=$cpu%.2f")
      // GRAFT_AQE_EXPLAIN=1: dump both physical plans so a re-planned
      // multiset diff can be attributed to the exact join (adaptive
      // subquery instantiation can also change the node count — the
      // diff alone doesn't say which join AQE converted)
      if (sys.env.get("GRAFT_AQE_EXPLAIN").contains("1")) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        println(s"===== $name STATIC PLAN =====\n" +
          fn(spark, sfDir).queryExecution.executedPlan.toString.take(12000))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        val df2 = fn(spark, sfDir)
        df2.write.format("noop").mode("overwrite").save()
        println(s"===== $name ADAPTIVE FINAL PLAN =====\n" +
          df2.queryExecution.executedPlan.toString.take(12000))
        GraftSession.dropQueryState(spark)
      }
    }
    spark.stop()
  }
}
