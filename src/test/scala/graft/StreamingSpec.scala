package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Structured Streaming surface driven synchronously (memory sink +
  * AvailableNow) against parquet landed in a temp dir.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val streamDir: String = {
    val dir = TestSpark.tmpDir("events-stream")
    val batch = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 00:20:00"), 10L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 01:10:00"), 10L, "view", 3.0, "{}"),   // >30min gap: new session
      (4L, ts("2024-01-01 00:15:00"), 20L, "click", 4.0, "{}"),
      (5L, ts("2024-01-01 02:00:00"), 20L, "error", 5.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming SCD2 snapshot equals batch scd2History current rows") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val srcDir = TestSpark.tmpDir("scd2-src")
    val ckpt   = TestSpark.tmpDir("scd2-ckpt")
    val outDir = TestSpark.tmpDir("scd2-out")

    val batch1 = Seq(
      (1L, ts("2024-01-01 00:01:00"), 10L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 00:02:00"), 10L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 00:03:00"), 10L, "click", 1.0, "{}"),
      (4L, ts("2024-01-01 00:01:00"), 20L, "error", 1.0, "{}"))
    val batch2 = Seq(
      (5L, ts("2024-01-01 00:04:00"), 10L, "click", 1.0, "{}"),
      (6L, ts("2024-01-01 00:05:00"), 10L, "view", 1.0, "{}"),
      (7L, ts("2024-01-01 00:06:00"), 20L, "error", 1.0, "{}"))
    def land(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(srcDir)

    def run(): Unit = {
      val stream = EventStreams.readStream(spark, srcDir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.EventRow]
      val q = EventStreams.scd2Current(stream).toDF()
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .start()
      q.processAllAvailable(); q.stop()
    }

    land(batch1); run()
    land(batch2); run() // restart from checkpoint: state must carry over

    // latest streaming snapshot per user (max version wins)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"version".desc)
    val streamed = spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_type", $"since_micros", $"version")

    // batch reference over the SAME landed data
    val all = spark.read.parquet(srcDir)
    val batchCur = graft.ops.Scd.scd2History(
        all, "user_id", "event_type", "ts", "event_id")
      .filter($"is_current")
      .select($"user_id", $"event_type",
        unix_micros($"valid_from").as("since_micros"), $"version")
    assert(streamed.exceptAll(batchCur).isEmpty &&
      batchCur.exceptAll(streamed).isEmpty,
      s"stream:\n${streamed.collect().mkString("\n")}\n" +
        s"batch:\n${batchCur.collect().mkString("\n")}")
    // user 10: view -> click -> view = 3 versions; user 20: error = 1
    val vers = streamed.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(vers == Map(10L -> 3L, 20L -> 1L))
  }

  test("streaming CDC upsert view equals batch cdcApply, late rows ignored") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val srcDir = TestSpark.tmpDir("cdc-src")
    val ckpt   = TestSpark.tmpDir("cdc-ckpt")
    val outDir = TestSpark.tmpDir("cdc-out")

    val batch1 = Seq(
      (1L, 3L, "U", "a1", 1.0), (1L, 5L, "U", "a2", 2.0),
      (2L, 6L, "U", "b1", 3.0), (3L, 1L, "I", "c", 4.0))
    // batch 2 carries a delete AND a LATE lower-seq row for key 1 (seq 4
    // arriving after seq 5 was already applied) — state must hold
    val batch2 = Seq(
      (2L, 7L, "D", "x", 0.0), (1L, 4L, "U", "stale", 9.9),
      (4L, 9L, "I", "d", 5.0))
    def land(rows: Seq[(Long, Long, String, String, Double)]): Unit =
      rows.toDF("k", "seq", "op", "name", "v")
        .coalesce(1).write.mode("append").parquet(srcDir)

    def run(): Unit = {
      val stream = spark.readStream
        .schema("k LONG, seq LONG, op STRING, name STRING, v DOUBLE")
        .parquet(srcDir).as[EventStreams.CdcLogRow]
      val q = EventStreams.cdcCurrent(stream).toDF()
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .start()
      q.processAllAvailable(); q.stop()
    }

    land(batch1); run()
    land(batch2); run() // restart from checkpoint: tombstones + seqs carry

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"last_seq".desc)
    val streamed = spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .filter($"present")
      .select($"k", $"name", $"v")

    val emptyBase = Seq.empty[(Long, String, Double)].toDF("k", "name", "v")
    val batchRef = graft.ops.Diff.cdcApply(emptyBase,
      spark.read.parquet(srcDir), Seq("k"), "seq", "op")
    assert(streamed.exceptAll(batchRef).isEmpty &&
      batchRef.exceptAll(streamed).isEmpty,
      s"stream:\n${streamed.collect().mkString("\n")}\n" +
        s"batch:\n${batchRef.collect().mkString("\n")}")
    val got = streamed.as[(Long, String, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> "a2", 3L -> "c", 4L -> "d")) // key 2 deleted
  }

  test("windowed stats over a file stream (watermark + tumbling window)") {
    val stream = EventStreams.readStream(spark, streamDir)
    assert(stream.isStreaming)
    // Complete mode: with a single AvailableNow batch the watermark never
    // passes the last window, so append mode would emit nothing yet.
    val q = EventStreams.runToMemory(
      EventStreams.windowedStats(stream, "1 hour", "1 hour", "2 hours"), "win_out",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    try {
      val out = spark.table("win_out")
        .select($"window_start", $"event_type", $"n_events")
        .orderBy($"window_start", $"event_type")
      val got = TestSpark.rows(out)
      // hour 0: 3 clicks (2 from u10 + 1 from u20); hour 1: 1 view; hour 2: 1 error
      assert(got.map(r => (r(1), r(2))) ==
        Seq(("click", 3L), ("view", 1L), ("error", 1L)))
    } finally q.stop()
  }

  test("session windows with 30 minute gap") {
    val stream = EventStreams.readStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.sessionStats(stream, "30 minutes", "2 hours"), "sess_out",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    try {
      val out = spark.table("sess_out").orderBy($"user_id", $"session_start")
      val got = TestSpark.rows(out.select($"user_id", $"n_events"))
      // u10: session(00:05-00:20)=2 events, session(01:10)=1; u20: two 1-event sessions
      assert(got == Seq(Seq(10L, 2L), Seq(10L, 1L), Seq(20L, 1L), Seq(20L, 1L)))
    } finally q.stop()
  }

  test("mapGroupsWithState running totals across a micro-batch") {
    val stream = EventStreams.readStream(spark, streamDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.EventRow]
    val q = EventStreams.runToMemory(
      EventStreams.runningUserTotals(stream).toDF(), "totals_out",
      org.apache.spark.sql.streaming.OutputMode.Update())
    try {
      val out = spark.table("totals_out")
      // last update per user carries the final totals
      val finals = out.groupBy($"user_id")
        .agg(max($"n_events").as("n"), max($"total_value").as("v"))
        .orderBy($"user_id")
      assert(TestSpark.rows(finals) == Seq(Seq(10L, 3L, 6.0), Seq(20L, 2L, 9.0)))
    } finally q.stop()
  }

  test("dedupStream drops duplicate event ids within the watermark") {
    val dupDir = TestSpark.tmpDir("events-dup")
    val batch = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.0, "{}"),
      (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.0, "{}"), // exact dup
      (2L, ts("2024-01-01 00:06:00"), 10L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.coalesce(1).write.mode("overwrite").parquet(dupDir)
    val stream = EventStreams.readStream(spark, dupDir)
    val q = EventStreams.runToMemory(
      EventStreams.dedupStream(stream, Seq("event_id")), "dedup_out")
    try {
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("stateful query resumes from checkpoint with state intact") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val srcDir = TestSpark.tmpDir("events-ckpt-src")
    val ckpt   = TestSpark.tmpDir("events-ckpt")

    def write(batchId: Int, rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.map { case (id, t, u, v) => (id, ts(t), u, "click", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(srcDir)

    val outDir = TestSpark.tmpDir("events-ckpt-out")
    def run(): Unit = {
      val stream = EventStreams.readStream(spark, srcDir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.EventRow]
      // foreachBatch: the sink shape that supports checkpoint recovery for
      // update-mode stateful output
      val q = EventStreams.runningUserTotals(stream).toDF()
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
      q.processAllAvailable(); q.stop()
    }

    write(0, Seq((1L, "2024-01-01 00:01:00", 10L, 1.0),
                 (2L, "2024-01-01 00:02:00", 10L, 2.0)))
    run()
    // second incarnation: new data lands, query restarts from the checkpoint
    write(1, Seq((3L, "2024-01-01 00:03:00", 10L, 4.0)))
    run()
    val finals = spark.read.parquet(outDir)
      .groupBy($"user_id").agg(max($"n_events").as("n"), max($"total_value").as("v"))
      .collect()
    // state carried across restart: 3 events total, value 7.0 — not just batch 2
    assert(finals.length == 1)
    assert(finals(0).getLong(1) == 3L && finals(0).getDouble(2) == 7.0)
  }

  test("windowedStats applies identically to the batch events table") {
    val batch = spark.read.parquet(streamDir)
    val out = EventStreams.windowedStats(batch, "1 hour", "1 hour", "2 hours")
    assert(out.count() == 3)
  }

  test("stream-stream interval join pairs clicks with views within the window") {
    val stream = EventStreams.readStream(spark, streamDir)
    val clicks = stream.filter($"event_type" === "click")
      .select($"event_id", $"ts", $"user_id")
    val views = stream.filter($"event_type" === "view")
      .select($"event_id", $"ts", $"user_id")
    val joined = EventStreams.intervalJoin(clicks, views, "user_id",
      before = "10 minutes", after = "60 minutes")
    assert(joined.isStreaming)
    val q = EventStreams.runToMemory(
      joined.select($"l_event_id", $"r_event_id"), "ij_out")
    try {
      val got = TestSpark.rows(spark.table("ij_out").orderBy($"l_event_id"))
      // u10's view at 01:10 falls within +60min of the 00:20 click only;
      // u20 has no views
      assert(got == Seq(Seq(2L, 3L)))
    } finally q.stop()
  }

  test("streaming ingest screening equals the batch incremental dedup") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(100).cache()
    val sigDir = TestSpark.tmpDir("scr-sigs") + "/sigs"
    graft.llm.Dedup.writeMinhashSignatures(docs, "text", "doc_id", sigDir,
      shingleSize = 2, numHashes = 64)
    // ingest = near-dup mutations of docs 0..19, landed as TWO files so the
    // stream sees more than one micro-batch
    val ingest = docs.filter($"doc_id" < 20)
      .select(($"doc_id" + 5000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 3, 100000), ' ')").as("text"))
      .cache()
    val inDir = TestSpark.tmpDir("scr-in")
    ingest.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(inDir)
    ingest.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(inDir)
    val outDir = TestSpark.tmpDir("scr-out") + "/flagged"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = EventStreams.screenIngest(stream, sigDir, outDir,
      "text", "doc_id", shingleSize = 2, numHashes = 64, bands = 16,
      threshold = 0.4)
    try {
      val got = spark.read.parquet(outDir)
        .select($"new_id", $"existing_id").as[(Long, Long)].collect().toSet
      val batchRef = graft.llm.Dedup.dedupAgainstSignatures(ingest, "text",
          "doc_id", spark.read.parquet(sigDir),
          shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.4)
        .select($"new_id", $"existing_id").as[(Long, Long)].collect().toSet
      assert(got == batchRef, s"stream ${got.size} vs batch ${batchRef.size}")
      // the planted mutation sources must be flagged
      assert(got.count { case (n, e) => e == n - 5000 } >= 15)
    } finally q.stop()
  }

  test("streaming drift monitor: per-batch PSI tracks a planted shift, final equals batch") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val srcDir = TestSpark.tmpDir("drift-src")
    val ckpt   = TestSpark.tmpDir("drift-ckpt")
    val landed = TestSpark.tmpDir("drift-landed")
    val ref = (1 to 500).map(i => ("k", i % 100 * 1.0)).toDF("k", "v")

    def land(shift: Double, idBase: Long): Unit =
      (1 to 500).map(i => (idBase + i, ts("2024-01-01 00:01:00"), 1L, "view",
          i % 100 * 1.0 + shift, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(srcDir)

    val psis = scala.collection.mutable.ArrayBuffer.empty[Double]
    def run(): Unit = {
      val q = EventStreams.readStream(spark, srcDir).writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // the monitoring pattern: land the batch, re-score the PSI of
          // everything landed so far against the frozen reference
          b.write.mode("append").parquet(landed)
          val cur = spark.read.parquet(landed)
            .select(lit("k").as("k"), $"value".as("v"))
          psis += graft.ops.Drift.psi(ref, cur, "k", "v", 10.0, 10)
            .head().getDouble(3)
          ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }

    land(shift = 0.0, idBase = 0); run()     // matching distribution
    land(shift = 40.0, idBase = 1000); run() // broken feed: 40% unit shift

    assert(psis.size == 2, psis.toString)
    assert(psis(0) < 0.01, s"clean batch scored ${psis(0)}")
    assert(psis(1) > 0.1, s"post-shift mixed corpus scored only ${psis(1)}")
    // restart-with-checkpoint parity: the final streaming figure equals the
    // batch PSI over the same landed rows
    val batchPsi = graft.ops.Drift.psi(ref,
        spark.read.parquet(landed).select(lit("k").as("k"), $"value".as("v")),
        "k", "v", 10.0, 10).head().getDouble(3)
    assert(math.abs(psis(1) - batchPsi) < 1e-12)
  }

  test("interval join applies identically in batch mode") {
    val batch = spark.read.parquet(streamDir)
    val clicks = batch.filter($"event_type" === "click")
      .select($"event_id", $"ts", $"user_id")
    val views = batch.filter($"event_type" === "view")
      .select($"event_id", $"ts", $"user_id")
    val got = TestSpark.rows(
      EventStreams.intervalJoin(clicks, views, "user_id",
          before = "10 minutes", after = "60 minutes")
        .select($"l_event_id", $"r_event_id").orderBy($"l_event_id"))
    assert(got == Seq(Seq(2L, 3L)))
  }

  test("state-store advisor flags an over-heap projection and keeps the " +
    "default under it") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    val rowBytes = EventStreams.estimatedStateRowBytes(schema)
    assert(rowBytes > 100 && rowBytes < 1000,
      s"dedup state row estimate out of the calibrated band: $rowBytes")
    // planted OVER-heap projection: more state rows than any test heap
    // holds (the f500 class: ~100 GB of projected state)
    val over = EventStreams.adviseStateStore(spark,
      projectedRows = 1000000000L, stateRowBytes = rowBytes)
    assert(over.overBudget, s"1e9 rows must exceed the heap budget: $over")
    assert(!over.switched, "without autoSwitch the advisor only recommends")
    assert(over.recommendation.contains("RocksDB"))
    assert(!spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDB"), "no autoSwitch -> provider stays the default")
    // under-heap projection: keep the default store (it wins every
    // measured speed comparison)
    val under = EventStreams.adviseStateStore(spark,
      projectedRows = 10000L, stateRowBytes = rowBytes)
    assert(!under.overBudget && !under.switched)
    assert(under.recommendation.contains("default"))
    // autoSwitch on an over-heap projection sets the session conf
    try {
      val switched = EventStreams.adviseStateStore(spark,
        projectedRows = 1000000000L, stateRowBytes = rowBytes,
        autoSwitch = true)
      assert(switched.switched)
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
