package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling for corpus subsetting.
  *
  * `df.sample()` is seed-dependent per partitioning and not reproducible
  * across runs/layouts; training-data pipelines need the property "the same
  * document is always in (or out of) the sample, regardless of cluster
  * layout, today and next month". These operators derive the decision from
  * a multiplicative integer hash of a stable key — reproducible anywhere,
  * including in a SQL oracle.
  */
object Sampling {

  /** Knuth multiplicative hash of a long key into [0, 2^32). Spelled in
    * plain integer arithmetic (ANSI-overflow-safe for keys < 2^30) so any
    * engine computes the identical value.
    */
  def keyHash(key: Column): Column =
    pmod(key.cast("long") * lit(2654435761L), lit(4294967296L))

  /** Keep ~`percent`% of rows, decided per key: stable under repartition,
    * re-run, and engine change.
    */
  def sampleByKey(df: DataFrame, keyCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100)
    df.filter(pmod(keyHash(col(keyCol)), lit(100)) < percent)
  }

  /** At most `n` rows per stratum, chosen deterministically by key hash
    * (ties broken by the key itself). One shuffle on the stratum column.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyHash(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
