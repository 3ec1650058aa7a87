package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface for the `events` table (additive scope —
  * the reference is batch-only, SURVEY.md §1.1). The same transforms apply
  * to batch DataFrames (window/session_window work in both modes), so each
  * operator is written against a plain DataFrame and can be driven by
  * `readStream` or `read`.
  *
  * State store backend: the default (HDFS-backed, in-heap) store won the
  * round-6 A/B at every stress factor — RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`) measured 6.1x slower
  * on the 36M-row dedup at 40M events and ~1.6x slower at 100M, ~20%
  * slower on window aggs and custom state (BENCH_NOTES_r6.md §2). Switch
  * to RocksDB only when state-per-executor approaches executor heap: its
  * state lives off-heap, and it completed the 100M-event dedup in an 8 GiB
  * heap where the default store OOMed (the default needs heap sized to
  * state, e.g. 48 GiB for the same run).
  */
object EventStreams {

  /** events schema as driver testdata provides it (ts normalized to
    * TimestampType; the parquet carries TIMESTAMP(NANOS)).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based event stream: picks up parquet files as they land —
    * the streaming mirror of the batch events reader.
    */
  def readStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling/sliding window counts + value sums with a watermark for state
    * cleanup and late-data discipline. `slide == windowLen` gives tumbling.
    */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user with an inactivity gap — the streaming-native
    * form of the batch sessionize query (SparkEntry q30).
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drops repeated `idCols` rows, with the watermark
    * bounding the dedup state (ids older than the watermark are evicted) —
    * the streaming mirror of Dedup.exact for at-least-once sources.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(idCols :+ "ts")

  /** Stream-stream interval join: for each row of `left`, matching rows of
    * `right` with the same `key` whose timestamp falls in
    * [left.ts - before, left.ts + after]. Both sides carry watermarks so the
    * join state is bounded (rows outside watermark + interval are evicted) —
    * the Structured Streaming correlation primitive (click/view attribution,
    * request/response pairing). Columns are prefixed l_/r_ to keep the two
    * sides' schemas disjoint.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   before: String = "30 minutes", after: String = "30 minutes",
                   watermark: String = "2 hours",
                   tsCol: String = "ts"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_$tsCol", watermark)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $before") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $after"))
  }

  // --- state-store sizing advisor -------------------------------------------

  /** Verdict of [[adviseStateStore]]: the projection, the per-executor heap
    * budget it was judged against, and what to do.
    */
  final case class StateAdvice(projectedRows: Long, projectedBytes: Long,
                               budgetBytes: Long, overBudget: Boolean,
                               switched: Boolean, recommendation: String,
                               projectedRocksDbBytes: Long = 0L)

  /** Rough on-heap bytes per state row under the DEFAULT (HDFS-backed)
    * store. CALIBRATED (round 8) against a direct measurement instead of
    * the r6 OOM-boundary inference: the f50 dedup stream's end-of-run
    * state metrics read 472.2 MB for 720k rows of (long, timestamp) state
    * — 656 B/row where the old formula forecast 128 (5.1x low; the old
    * number survived because Stress also over-projected ROWS 5x, two
    * errors canceling). The measured width decomposes as ~2 retained
    * version maps (spark.sql.streaming.maxBatchesToRetainInMemory default)
    * x (two UnsafeRow objects + backing arrays + map-entry overhead +
    * payload on both the key and value side), which this formula models —
    * it reproduces the measurement exactly for the dedup schema and
    * scales with payload for wider state. Still a forecast, not an
    * accounting; the advisor compares order-of-magnitude state against
    * heap.
    */
  def estimatedStateRowBytes(schema: StructType,
                             avgStringBytes: Int = 24): Long = {
    val payload = schema.fields.map(_.dataType match {
      case StringType | BinaryType => 8L + avgStringBytes
      case _ => 8L
    }).sum
    // 2 retained versions x (object/entry overhead + key+value payload)
    2L * (296L + 2L * payload)
  }

  /** Rough OFF-HEAP bytes per state row under the RocksDB store — a
    * DIFFERENT quantity than [[estimatedStateRowBytes]]: RocksDB holds
    * serialized key+value UnsafeRows in memtables/block cache (no JVM
    * object headers, no retained version maps), and the store's reported
    * `memoryUsedBytes` is block/memtable usage. CALIBRATED (round 8)
    * against the f500 dedup stream: 286 B/row measured for (long,
    * timestamp) state (BENCH_NOTES_r8 §9); modeled as a fixed
    * index/filter/memtable-entry overhead plus one serialized copy of key
    * and value each. Use THIS width when projecting or validating a
    * RocksDB-backed stream — judging RocksDB usage against the on-heap
    * width reads as a phantom ~2.3x error. CAVEAT (round 9): the store's
    * reported memoryUsedBytes is an end-of-run snapshot of block cache +
    * memtable fill, and the SAME config read 543 B/row on a later run —
    * ~2x run-to-run swing is inherent to the metric, so treat this
    * forecast as order-of-magnitude (it only colors the switch
    * recommendation; the advisor's fit decision uses the on-heap width).
    */
  def estimatedRocksDbRowBytes(schema: StructType,
                               avgStringBytes: Int = 24): Long = {
    val payload = schema.fields.map(_.dataType match {
      case StringType | BinaryType => 8L + avgStringBytes
      case _ => 8L
    }).sum
    254L + 2L * payload
  }

  /** Projected state footprint vs the per-executor heap budget, decided at
    * STREAM START. The default HDFS-backed store keeps every state row
    * on-heap (plus a transient snapshot copy during maintenance), so a
    * projection above `headroomFraction` of the executor heap forecasts
    * the f500-class failure the r6 stress measured: the 100M-event dedup
    * OOMed the default store at the 8 GiB default heap and completed on
    * RocksDB (state off-heap) at the known speed cost (up to 6.1x on
    * dedup — BENCH_NOTES_r6 §2, scaladoc at the top of this object).
    * Calling this turns that OOM-hours-into-production into a logged
    * recommendation — or, with `autoSwitch`, an automatic session-level
    * switch to RocksDB (affects every stream started on this session
    * afterwards; scope it to a dedicated session if that matters).
    *
    * `projectedRows` is the operator's PEAK state cardinality. For dedup
    * that is the larger of (a) distinct keys within the watermark horizon
    * and (b) distinct keys per MICRO-BATCH — the watermark only advances
    * between batches, so a batch's entire key set sits in state until the
    * batch commits (the r6 f500 OOM was exactly this peak: ~18M
    * per-batch keys, not the 720k horizon keys). Open windows x group
    * values for windowed aggs, |users| for custom state — estimate from
    * a batch sample of the same feed. State rows hash-partition across executors,
    * so the budget is heap x headroom x executors.
    *
    * `executors` = 0 autodetects from the status tracker, which is right
    * for local mode and static allocation but UNDER-COUNTS under dynamic
    * allocation or right after session start (executors not yet
    * registered) — the failure is conservative (a false RocksDB switch at
    * the known speed cost, never an OOM), but callers on
    * dynamically-allocated clusters should pass their planned executor
    * count explicitly.
    */
  def adviseStateStore(spark: SparkSession, projectedRows: Long,
                       stateRowBytes: Long, headroomFraction: Double = 0.5,
                       autoSwitch: Boolean = false,
                       executors: Int = 0,
                       rocksDbRowBytes: Long = 0): StateAdvice = {
    require(projectedRows >= 0 && stateRowBytes > 0)
    require(headroomFraction > 0 && headroomFraction <= 1)
    // local mode: spark.executor.memory is inert (the only heap is this
    // JVM's -Xmx), so a harmlessly-set conf must not make the advisor
    // budget against a heap that does not exist — in either direction
    // (false RocksDB switch or a missed OOM forecast). Only trust the
    // conf on a real cluster master.
    val heap =
      if (spark.sparkContext.isLocal) Runtime.getRuntime.maxMemory()
      else spark.conf.getOption("spark.executor.memory")
        .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
        .getOrElse(Runtime.getRuntime.maxMemory())
    // local mode: the one JVM is the only "executor"; cluster: driver is
    // the extra row in the executor infos
    val execs =
      if (executors > 0) executors
      else math.max(1,
        spark.sparkContext.statusTracker.getExecutorInfos.length - 1)
    val budget = (heap * headroomFraction).toLong * execs
    val projected = projectedRows * stateRowBytes
    val over = projected > budget
    // the RocksDB side of the forecast is off-heap block/memtable usage
    // (estimatedRocksDbRowBytes) — a different width than the on-heap
    // projection; when the caller supplies it, the switch recommendation
    // can say what the RocksDB footprint WILL be instead of implying the
    // on-heap number carries over
    val projectedRocks =
      if (rocksDbRowBytes > 0) projectedRows * rocksDbRowBytes else 0L
    val rocksNote =
      if (projectedRocks > 0)
        f" (RocksDB off-heap forecast: ${projectedRocks / 1e9}%.2f GB " +
          "block/memtable usage)"
      else ""
    val rec =
      if (!over)
        f"projected state ${projected / 1e9}%.2f GB fits the " +
          f"${budget / 1e9}%.2f GB budget (heap x $headroomFraction x " +
          s"$execs executors) — keep the default HDFS-backed store " +
          "(fastest at every measured factor)"
      else
        f"projected state ${projected / 1e9}%.2f GB EXCEEDS the " +
          f"${budget / 1e9}%.2f GB budget — switch " +
          "spark.sql.streaming.stateStore.providerClass to RocksDB " +
          "(state off-heap; slower but completes where the default OOMs)" +
          rocksNote +
          ", or raise executor memory / shorten the watermark horizon"
    val switched = over && autoSwitch
    if (switched)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider")
    StateAdvice(projectedRows, projected, budget, over, switched, rec,
      projectedRocks)
  }

  // --- custom state: per-user cumulative counters ---------------------------

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful aggregation via mapGroupsWithState: running per-user
    * totals across micro-batches. State is one small case class per user —
    * bounded by the user cardinality, the partitioning is by group key.
    */
  def runningUserTotals(events: Dataset[EventRow]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          rows.foreach { r => n += 1; v += r.value }
          val next = UserTotals(user, n, v)
          state.update(next)
          next
      }
  }

  final case class ScdState(attr: String, sinceEpochMicros: Long, version: Long)
  final case class ScdCurrent(user_id: Long, event_type: String,
                              since_micros: Long, version: Long)

  /** Streaming SCD2 current-snapshot: tracks each key's latest tracked-
    * attribute interval across micro-batches — the continuous form of
    * [[graft.ops.Scd.scd2History]]'s `is_current` rows, proven equal to it
    * in StreamingSpec. State per key is one (attr, since, version) record;
    * within a micro-batch the group's rows sort in (ts, event_id) order
    * (bounded by the trigger's per-key volume), and versions keep counting
    * across batches, so replay through ANY micro-batch slicing yields the
    * same snapshot.
    */
  def scd2Current(events: Dataset[EventRow]): Dataset[ScdCurrent] = {
    import events.sparkSession.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[ScdState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.orNull
          sorted.foreach { e =>
            if (st == null || st.attr != e.event_type)
              st = ScdState(e.event_type, micros(e.ts),
                (if (st == null) 0L else st.version) + 1L)
          }
          state.update(st)
          ScdCurrent(user, st.attr, st.sinceEpochMicros, st.version)
      }
  }

  final case class CdcLogRow(k: Long, seq: Long, op: String, name: String,
                             v: Double)
  final case class CdcKeyState(last_seq: Long, op: String, name: String,
                               v: Double)
  final case class CdcSnapshotRow(k: Long, present: Boolean, name: String,
                                  v: Double, last_seq: Long)

  /** Streaming CDC upsert view — the continuous twin of
    * [[graft.ops.Diff.cdcApply]] (proven equal in StreamingSpec): per key
    * the highest-sequence row wins across ANY micro-batch slicing, op `D`
    * tombstones the key (present=false) without forgetting it, so a LATE
    * lower-sequence update can never resurrect or regress state. State per
    * key is one small record; partitioning is by the group key.
    */
  def cdcCurrent(log: Dataset[CdcLogRow]): Dataset[CdcSnapshotRow] = {
    import log.sparkSession.implicits._
    log
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[CdcLogRow], state: GroupState[CdcKeyState]) =>
          val top = rows.maxBy(_.seq)
          val cur = state.getOption
          val next =
            if (cur.isEmpty || top.seq > cur.get.last_seq)
              CdcKeyState(top.seq, top.op, top.name, top.v)
            else cur.get
          state.update(next)
          CdcSnapshotRow(k, next.op != "D", next.name, next.v, next.last_seq)
      }
  }

  /** Streaming ingest near-dup screening: every micro-batch of documents is
    * checked against the PERSISTED corpus signature table
    * ([[graft.llm.Dedup.writeMinhashSignatures]] layout) via foreachBatch,
    * and flagged (new_id, existing_id, jaccard_est) pairs append to
    * `outPath`. The corpus lives entirely in the static table, so the
    * stream holds NO accumulating state — each trigger is one bounded
    * incremental-dedup job ([[graft.llm.Dedup.dedupAgainstSignatures]]:
    * batch side broadcast, corpus signatures never shuffled). This is the
    * continuous-ingest shape of the daily-batch q83 pipeline.
    */
  def screenIngest(docs: DataFrame, sigPath: String, outPath: String,
                   textCol: String, idCol: String,
                   shingleSize: Int = 3, numHashes: Int = 32,
                   bands: Int = 8, threshold: Double = 0.5): StreamingQuery = {
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sigs = batch.sparkSession.read.parquet(sigPath)
        graft.llm.Dedup.dedupAgainstSignatures(batch.toDF(), textCol, idCol,
            sigs, shingleSize, numHashes, bands, threshold)
          .write.mode("append").parquet(outPath)
        ()
      }
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** Drive a streaming DataFrame to a named in-memory table and block until
    * all available input is processed — the local test/verification harness
    * (format("memory") + processAllAvailable).
    */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Append()): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
