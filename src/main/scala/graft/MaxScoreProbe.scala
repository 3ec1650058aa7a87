package graft

import org.apache.spark.sql.functions._

/** Round-7 measurement (VERDICT r6 next-item 6): is the max-score
  * essential/common split better chosen PER BATCH from the termstats than
  * fixed at df <= 0.2?
  *
  * Builds the f-replicated Zipf-tagged corpus + persisted index ONCE (the
  * r6 fixture: each doc tagged with one rare token at df = n/2000, queries
  * = one rare tag + two common words), then serves the same 1000-distinct-
  * query batch at a sweep of split fractions via the probe-only
  * package-private `Search.essentialDfFracOverride` hook (a system
  * property would be writable by co-resident code), reporting wall +
  * executor CPU per point. Decision rule (pre-declared): if the fixed 0.2 lands within
  * ~20% of the best point's CPU, the adaptive split buys nothing — record
  * the negative result and stop.
  *
  * Usage: runMain graft.MaxScoreProbe [sfDir] [factor] [fracsCsv]
  */
object MaxScoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(500)
    val fracs = args.lift(2).getOrElse("0.05,0.1,0.2,0.35,0.5")
      .split(",").map(_.toDouble).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-maxscore-probe")
      .config("spark.sql.shuffle.partitions", shuffle)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the Stress `search` fixture, verbatim shape: replicated docs with a
    // rare per-doc tag; 1000 queries of 1 rare + 2 common terms
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val replicas = spark.range(factor).select(col("id").as("rep"))
    val corpus = base.crossJoin(replicas)
      .select((col("doc_id") * factor + col("rep")).as("doc_id"),
        expr("substring(text, rep + 1)").as("text"))
      .repartition(cpus.toInt * 2)
    val tagged = corpus.withColumn("text",
      concat(col("text"), lit(" tag"), pmod(col("doc_id"), lit(2000L))))
      .persist()
    val n = tagged.count()
    println(s"[probe] corpus rows: $n (factor $factor)")
    val decA = Seq("stream", "value", "spark", "data", "big",
      "small", "vector", "group", "slow", "table")
    val decB = Seq("key", "column", "order", "scan", "window",
      "hash", "merge", "row", "customer", "join")
    val queries = (0L until 1000L).map(i =>
      (i + 1, s"tag${i % 2000} " + decA((i % 10).toInt) + " " +
        decB(((i / 10) % 10).toInt)))
      .toDF("query_id", "query_text")

    val idxDir = java.nio.file.Files
      .createTempDirectory("maxscore-probe-idx").toString
    val t0 = System.nanoTime()
    graft.llm.Search.writeSearchIndex(tagged, "text", "doc_id", idxDir)
    println(f"[probe] index build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    tagged.unpersist()

    val meter = new org.apache.spark.graft.BenchMetrics(spark.sparkContext)
    // warm pass outside the sweep (file listing, codegen) at the default
    graft.llm.Search.essentialDfFracOverride = None
    graft.llm.Search.querySearchIndex(spark, idxDir, queries, 10).count()
    GraftSession.dropQueryState(spark)
    // try/finally: an aborted sweep must not leave the probe-only
    // override set in a shared JVM (a leftover 0.5 would pin later
    // serving on the measured 25x-cliff cutoff)
    try fracs.foreach { f =>
      graft.llm.Search.essentialDfFracOverride = Some(f)
      val c0 = meter.cpuSeconds()
      val w0 = System.nanoTime()
      val rows = graft.llm.Search
        .querySearchIndex(spark, idxDir, queries, 10).count()
      val wall = (System.nanoTime() - w0) / 1e9
      val cpu = meter.cpuSeconds() - c0
      GraftSession.dropQueryState(spark)
      println(f"[probe] frac=$f%.2f  wall=$wall%7.1f s  cpu=$cpu%8.1f s  " +
        s"($rows result rows)")
    } finally graft.llm.Search.essentialDfFracOverride = None
    spark.stop()
  }
}
