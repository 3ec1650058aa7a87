package graft

import org.apache.spark.sql.functions._

/** Round-8 measurement (VERDICT r7 what's-wrong #1): the full-sweep
  * cross-JVM baseline read q107_countmin's executor CPU at 0.67 s
  * (local[16]) vs 3.32 s (2-executor standalone) — the one measured
  * cross-JVM shape outlier. The suspect is the d x w long-grid partial
  * buffer encoding/decoding across REAL exchanges (local mode short-cuts
  * some of that cost), which is linear in MAP TASK COUNT, not rows.
  *
  * This probe isolates exactly that: a factor-replicated token stream
  * through the CountMin aggregate, sweeping (a) data volume at fixed task
  * count — CPU must scale with rows (the reduce path dominates) — and
  * (b) map task count at fixed volume — the per-task slope IS the
  * per-partial serialization constant. Run it under local[16] AND under
  * spark-submit on the 2-executor standalone master (GraftSession honors
  * spark.master); the standalone-minus-local slope difference is the
  * cross-JVM encode cost per partial.
  *
  * Decision rule (pre-declared, from the verdict): if the per-task
  * partial cost is flat across volumes and small in absolute terms,
  * record the negative result and stop; only if it grows or dominates
  * does the buffer encoding get rewritten.
  *
  * Usage: runMain graft.CountMinProbe [sfDir] [factorsCsv] [partsCsv]
  */
object CountMinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,4,16").split(",").map(_.toInt)
    val parts = args.lift(2).getOrElse("16,64,256").split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-countmin-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TypedAggregators

    val d = 6; val w = 2048
    val meter = new org.apache.spark.graft.BenchMetrics(spark.sparkContext)
    val baseToks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.llm.Search.searchTokens(col("text"))).as("tok"))

    def run(tag: String, factor: Int, nParts: Int): Unit = {
      import spark.implicits._
      val toks = baseToks
        .crossJoin(spark.range(factor).select(col("id").as("__rep")))
        .select(col("tok")).repartition(nParts).as[String]
        .persist()
      val n = toks.count() // materialize OUTSIDE the timed window
      // min-of-2: first run absorbs codegen
      val (wall, cpu) = (1 to 2).map { _ =>
        val c0 = meter.cpuSeconds()
        val t0 = System.nanoTime()
        val sk = toks.select(TypedAggregators.countMin(d, w).name("sk"))
          .collect()(0)
        require(sk.length == d * w)
        ((System.nanoTime() - t0) / 1e9, meter.cpuSeconds() - c0)
      }.minBy(_._2)
      toks.unpersist()
      println(f"[cmprobe] $tag factor=$factor parts=$nParts rows=$n " +
        f"wall=$wall%7.2f s cpu=$cpu%7.2f s cpuPerTask=${cpu / nParts * 1000}%8.2f ms")
    }

    // (a) volume sweep at fixed task count: reduce-path linearity
    factors.foreach(f => run("volume", f, parts(parts.length / 2)))
    // (b) task-count sweep at fixed volume: per-partial constant
    val midF = factors(factors.length / 2)
    parts.foreach(p => run("tasks", midF, p))
    spark.stop()
  }
}
