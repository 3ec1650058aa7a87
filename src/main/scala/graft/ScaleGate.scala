package graft

/** Plan-only run of [[ScaleChecks.staticViolations]] over every SparkEntry
  * query — the same gate Verify wires to exit 2, minus the execution, so a
  * full 600-plan hygiene pass takes seconds instead of a Verify run. Used
  * while iterating on a new check or a gallery fix; the authoritative gate
  * stays in Verify (this main exits 2 on violations too, so CI-style use
  * works either way).
  *
  * Usage: runMain graft.ScaleGate [sfDir] [queryCsv]
  */
object ScaleGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1).map(_.split(",").toSet)
    val wh = java.nio.file.Files.createTempDirectory("graft-gate-wh").toString
    val spark = GraftSession.hiveBuilder("local[8]", "graft-scale-gate", wh)
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var nViolations = 0
    var nFailed = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      try {
        val vs = ScaleChecks.staticViolations(fn(spark, sfDir))
        vs.foreach { v => nViolations += 1; println(s"[gate] $name: $v") }
      } catch {
        // queries that stage inputs at plan time (catalog DDL, streams)
        // can fail here without their Verify-run setup; report, don't abort
        case e: Exception =>
          nFailed += 1
          println(s"[gate] $name PLAN-FAILED: ${String.valueOf(e.getMessage).take(120)}")
      }
      GraftSession.dropQueryState(spark)
    }
    println(s"[gate] total violations: $nViolations, plan failures: $nFailed")
    spark.stop()
    // a query that fails to PLAN was never walked by any check — that must
    // not read as a hygiene pass in CI-style use (exit 3, distinct from
    // the violation exit 2, so callers can tell the two reds apart)
    if (nViolations > 0) sys.exit(2)
    if (nFailed > 0) sys.exit(3)
  }
}
