package graft

import org.apache.spark.sql.functions._

/** Round-9 measurement (VERDICT r8 Next #5): q139_coverage_select has been
  * the slowest sweep query four rounds running (7.5 s wall / 27.8 CPU-s at
  * sf0.1 local[32]) under the standing adjudication "per-round argmax jobs
  * by construction — scheduling-bound". The r8 sweep's CPU column says
  * otherwise: 27.8 CPU-s on 7.5 s wall is ~3.7 cores busy, which is WORK,
  * not scheduling. Before the verdict's batching experiment (pick top-B
  * per round) can be judged, the cost has to be decomposed — batching
  * rounds cannot help if the fixed setup (3-gram explode, the (id, item)
  * dedup shuffle, the seed aggregate) dominates the 5 rounds.
  *
  * Phases, cumulative by construction (each timed cold on its own cache):
  *   explode   build the (doc_id, 3gram) stream and count it — the
  *             string-building CPU floor, no shuffle
  *   itBuild   greedyMaxCover's setup: repartition(id) + dedup + sort +
  *             persist + count
  *   seed      the round-1 bound seed aggregate on the cached layout
  *   k1        full greedyMaxCover(terms, 1) — setup + seed + 1 pick
  *   k5        full greedyMaxCover(terms, 5) — the q139 call
  *
  * (k5 - k1) / 4 is the marginal per-round cost; if it is small against
  * k1, the verdict's round-batching experiment is a recorded negative and
  * the setup is the only real target.
  *
  * Usage: runMain graft.CelfProbe [sfDir] [repeat]
  */
object CelfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeat = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-celf-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new org.apache.spark.graft.BenchMetrics(spark.sparkContext)

    import graft.functions.{TextFunctions => TF}
    def terms = {
      val toks = TF.normTokens(col("text"))
      val grams = when(size(toks) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1),
            element_at(toks, i + 2), element_at(toks, i + 3))))
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), explode(grams).as("item"))
    }
    // warmup: footers, codegen, shuffle infra
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.range(1000000).selectExpr("sum(id) as s").collect()

    def time(name: String)(body: => Unit): Unit = {
      val (ws, cs) = (1 to repeat).map { _ =>
        val c0 = meter.cpuSeconds(); val t0 = System.nanoTime()
        body
        GraftSession.dropQueryState(spark)
        ((System.nanoTime() - t0) / 1e9, meter.cpuSeconds() - c0)
      }.unzip
      println(f"[celf-probe] $name%-10s wall ${ws.min}%6.2f s  " +
        f"cpu ${cs.min}%6.2f s  (min of $repeat)")
    }

    time("explode") { terms.write.format("noop").mode("overwrite").save() }
    time("itBuild") {
      val it = terms
        .select(col("doc_id").as("id"), col("item"))
        .repartition(col("id"))
        .dropDuplicates(Seq("id", "item"))
        .sortWithinPartitions(col("id"))
        .persist()
      it.count(); ()
    }
    time("seed") {
      val it = terms
        .select(col("doc_id").as("id"), col("item"))
        .repartition(col("id"))
        .dropDuplicates(Seq("id", "item"))
        .sortWithinPartitions(col("id"))
        .persist()
      it.count()
      it.groupBy(col("id")).agg(count(lit(1)).as("ub"))
        .localCheckpoint(true); ()
    }
    time("k1") {
      graft.ops.Selection.greedyMaxCover(terms, 1)
        .write.format("noop").mode("overwrite").save()
    }
    time("k5") {
      graft.ops.Selection.greedyMaxCover(terms, 5)
        .write.format("noop").mode("overwrite").save()
    }
    // batch-size sweep (the verdict's B=8 experiment): a smaller batch
    // fresh-evaluates fewer candidates per round but risks widen-ladder
    // re-collects when the decayed gains stay close to the stale bounds
    for (b <- Seq(8, 16, 256)) {
      time(s"k5 B=$b") {
        graft.ops.Selection.greedyMaxCover(terms, 5, celfBatch = b)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // --- round anatomy: which of a round's 4 jobs carries the ~2-4
    // CPU-s/round the k5-k1 delta shows? State is built once (it stays
    // cached across the timings, as in the real loop) and each component
    // job is timed min-of-3 against that live state.
    {
      val it = terms
        .select(col("doc_id").as("id"), col("item"))
        .repartition(col("id"))
        .dropDuplicates(Seq("id", "item"))
        .sortWithinPartitions(col("id"))
        .persist()
      it.count()
      val bounds = it.groupBy(col("id")).agg(count(lit(1)).as("ub"))
        .localCheckpoint(true)
      val w1 = bounds.orderBy(col("ub").desc, col("id")).limit(1)
        .collect().head.get(0)
      val covered = it.filter(col("id") === lit(w1)).select(col("item"))
        .localCheckpoint(true)
      val top = bounds.orderBy(col("ub").desc, col("id")).limit(65).collect()
      val batchIds = top.take(64).map(_.get(0)).toSeq
      def anatomy(name: String)(body: => Unit): Unit = {
        val (ws, cs) = (1 to repeat).map { _ =>
          val c0 = meter.cpuSeconds(); val t0 = System.nanoTime()
          body
          ((System.nanoTime() - t0) / 1e9, meter.cpuSeconds() - c0)
        }.unzip
        println(f"[celf-probe] $name%-14s wall ${ws.min}%6.2f s  " +
          f"cpu ${cs.min}%6.2f s  (min of $repeat, state cached)")
      }
      anatomy("r2.topCollect") {
        bounds.orderBy(col("ub").desc, col("id")).limit(65).collect(); ()
      }
      anatomy("r2.gains") {
        it.filter(col("id").isin(batchIds: _*))
          .join(covered, Seq("item"), "left_anti")
          .groupBy(col("id")).agg(count(lit(1)).as("gain"))
          .collect(); ()
      }
      anatomy("r2.coveredCkpt") {
        covered.union(
            it.filter(col("id") === lit(batchIds.head)).select(col("item")))
          .localCheckpoint(true); ()
      }
      anatomy("r2.boundsCkpt") {
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        val freshDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            batchIds.map(i => org.apache.spark.sql.Row(i, 10L)), 1),
          StructType(Seq(
            StructField("id", it.schema("id").dataType, nullable = true),
            StructField("__g", LongType, nullable = false))))
        bounds.filter(col("id") =!= lit(batchIds.head))
          .join(broadcast(freshDf), Seq("id"), "left")
          .select(col("id"), coalesce(col("__g"), col("ub")).as("ub"))
          .localCheckpoint(true); ()
      }
    }
    spark.stop()
  }
}
