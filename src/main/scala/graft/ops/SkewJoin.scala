package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins: when one join key carries a disproportionate
  * share of rows, a plain shuffle join lands the hot key on one task. Salting
  * splits the hot side's key into `factor` sub-keys and replicates the other
  * side across all sub-keys, so the hot partition fans out `factor`-ways.
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles most
  * cases at runtime; explicit salting remains the tool when the skew is in
  * the AGGREGATION after the join, or on engines/paths AQE doesn't cover.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with the left side salted
    * `factor` ways and the right side replicated. Result columns = left ++
    * right (minus the right key).
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    // deterministic salt from a per-partition row counter, NOT a row hash:
    // the classic hot-key case is many IDENTICAL rows under one key, and a
    // row hash would give them all the same salt (salting degrades to a
    // no-op exactly when needed). monotonically_increasing_id is stable
    // under task retry given deterministic upstream partitioning, and its
    // low bits cycle through salts within each partition.
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft
      .join(replicatedRight,
        col(leftKey) === col(rightKey) && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
      .drop(rightKey)
  }

  /** Two-phase (partial/final) aggregation for skewed group keys: first
    * aggregate on (key, salt), then re-aggregate on key. `partials` build
    * the salted partial aggregates; `finals` combine them. Equivalent to
    * what HashAggregateExec does automatically for algebraic aggregates —
    * spelled out for compositions where the partial isn't automatic (e.g.
    * exact distinct counts fed into a second stage).
    */
  def saltedAgg(df: DataFrame, key: String, factor: Int,
                partials: Seq[org.apache.spark.sql.Column],
                finals: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
  }
}
