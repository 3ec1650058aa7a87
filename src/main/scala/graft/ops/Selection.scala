package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Coverage-driven data selection: pick the k documents that together
  * cover the most distinct items (tokens, n-grams, topics) — the greedy
  * (1 - 1/e)-approximate maximum-coverage algorithm, which is the
  * submodular-selection step behind "choose a diverse subset to
  * annotate/train on" pipelines.
  *
  * Shape: per round one anti-join of the item table against the covered
  * set (shuffle on the item key) + a partial/final count per doc + a
  * TakeOrdered(1) for the argmax (never a full sort); the covered set
  * grows by union and is checkpointed per round so the plan stays flat,
  * exactly like connectedComponents. The winner is a 1-row driver
  * collect (bounded). k jobs total. For large k, CELF/lazy-greedy
  * (priority-queue re-evaluation) cuts most rounds' work — named here as
  * the follow-on optimization; round count, not corpus size, is what it
  * improves.
  */
object Selection {

  /** Greedy max-cover over `items` (first column: doc id, second: item);
    * duplicates are fine — coverage counts distinct items. Ties break on
    * the smaller id. Returns (round, id, gain) for the k picks, stopping
    * early when everything is covered.
    */
  def greedyMaxCover(items: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = items.sparkSession
    val it = items
      .select(col(items.columns(0)).as("id"), col(items.columns(1)).as("item"))
      .distinct().persist()
    var covered = it.select(col("item")).limit(0).localCheckpoint(true)
    val picks = scala.collection.mutable.ArrayBuffer.empty[Row]
    var round = 1
    while (round <= k) {
      val gains = it.join(covered, Seq("item"), "left_anti")
        .groupBy(col("id")).agg(count(lit(1)).as("gain"))
      val win = gains.orderBy(col("gain").desc, col("id")).limit(1).collect()
      if (win.isEmpty) round = k + 1 // all items covered: stop early
      else {
        val (winId, winGain) = (win.head.get(0), win.head.getLong(1))
        picks += Row(round.toLong, winId, winGain)
        covered = covered
          .union(it.filter(col("id") === lit(winId)).select(col("item")))
          .localCheckpoint(true)
        round += 1
      }
    }
    it.unpersist()
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("id", it.schema("id").dataType, nullable = true),
      StructField("gain", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(picks.toSeq, 1), schema)
  }

  /** 2-D Pareto frontier (skyline), both dimensions maximized — the
    * "best quality at every length" trade-off curve (no point on it is
    * beaten on both axes by any other). Returns the DISTINCT frontier
    * points with a representative min id and multiplicity.
    *
    * Shape: points collapse to the distinct (x, y) grid first (partial
    * agg), then one RANGE-partitioned two-phase prefix scan in
    * (x desc, y desc) order — per-partition running max of y via a
    * window, cross-partition offsets from the <= p-row per-partition max
    * table broadcast back (the [[PrefixSum]] pattern: no single global
    * ordering task). Over distinct points, dominated is EXACTLY
    * "some prefix point has y >= mine", so one comparison decides.
    */
  def paretoFrontier2d(df: DataFrame, xCol: String, yCol: String,
                       idCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pts = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(min(col(idCol)).as("min_id"), count(lit(1)).as("n_rows"))
    val ranged = pts
      .repartitionByRange(p, col("x").desc, col("y").desc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("x").desc, col("y").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid")).agg(max(col("y")).as("__pm"))
      .withColumn("__off", max(col("__pm")).over(wOff))
      .select(col("__pid"), col("__off"))
    ranged
      .withColumn("__wm", max(col("y")).over(wIn))
      .join(broadcast(offsets), Seq("__pid"))
      .filter(coalesce(greatest(col("__wm"), col("__off")),
        col("__wm"), col("__off")).isNull ||
        coalesce(greatest(col("__wm"), col("__off")),
          col("__wm"), col("__off")) < col("y"))
      .select(col("x"), col("y"), col("min_id"), col("n_rows"))
  }
}
