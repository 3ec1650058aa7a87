package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming checkpoint-restart parity probe, runnable under cluster
  * submission (the multi-executor twin of StreamingSpec's single-JVM
  * "resumes from checkpoint" case): a stateful flatMapGroupsWithState
  * query processes batch 0, stops, RESTARTS from its checkpoint in a
  * second incarnation after batch 1 lands, and the final per-user state
  * must reflect ALL events — proving the state store round-trips through
  * the checkpoint across separate executor JVMs, not just one local one.
  *
  * Usage: spark-submit --class graft.StreamSmoke <jar> [workDir]
  * Prints `[stream-smoke] PASS` or exits 1.
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-stream-smoke").toString)
    val spark = GraftSession.builder("local[4]", "graft-stream-smoke")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val srcDir = s"$work/src"
    val ckpt = s"$work/ckpt"
    val outDir = s"$work/out"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def land(rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.map { case (id, t, u, v) => (id, ts(t), u, "click", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def run(): Unit = {
      val stream = graft.streaming.EventStreams.readStream(spark, srcDir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[graft.streaming.EventStreams.EventRow]
      val q = graft.streaming.EventStreams.runningUserTotals(stream).toDF()
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    land(Seq((1L, "2024-01-01 00:01:00", 10L, 1.0),
             (2L, "2024-01-01 00:02:00", 10L, 2.0),
             (4L, "2024-01-01 00:02:30", 20L, 5.0)))
    run()
    land(Seq((3L, "2024-01-01 00:03:00", 10L, 4.0),
             (5L, "2024-01-01 00:04:00", 20L, 1.5)))
    run() // second incarnation: restart from checkpoint, state must carry
    val finals = spark.read.parquet(outDir)
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), max($"total_value").as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val ok = finals.get(10L).contains((3L, 7.0)) &&
      finals.get(20L).contains((2L, 6.5))
    println(s"[stream-smoke] master=${spark.sparkContext.master} " +
      s"finals=$finals -> ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
