package graft

import org.apache.spark.sql.DataFrame

/** Shared materialization point for straight-line (non-iterative)
  * multi-consumer intermediates on the query paths.
  *
  * The default is a LAZY `localCheckpoint(false)`: raw-row storage beats the
  * InMemoryRelation columnar cache 3-30x CPU on these narrow intermediates
  * (round-9 interleaved A/Bs), and laziness keeps the materialization inside
  * the first consumer job instead of adding a serial barrier. The trade-off
  * is fault tolerance: lineage is truncated, so on a cluster a lost executor
  * fails the query instead of recomputing. A cluster deployment flips ONE
  * switch — `spark.graft.reliableMaterialize=true` (plus
  * `sparkContext.setCheckpointDir`) — to route every such site through a
  * reliable (HDFS-backed) checkpoint, mirroring the `reliableCheckpoints`
  * parameter the iterative operators (Graph, Selection, Dedup loops) already
  * expose. Reliable checkpoints must be eager: a lazy reliable checkpoint
  * still recomputes the frame once per consumer until something forces it,
  * which is exactly the duplicated work this site exists to prevent.
  *
  * Local defaults are unchanged by this indirection: `df.materialize` ==
  * `df.localCheckpoint(false)` unless the conf is set.
  */
object Materialize {
  val ConfKey = "spark.graft.reliableMaterialize"

  /** `spark.graft.explainMaterialize=true` prints each materialize site's
    * INPUT physical plan before the checkpoint truncates it — plan audits
    * (Plans/`plans/rN/` dumps) otherwise see only a `Scan ExistingRDD`
    * stub for the materialized subtree (round-9 verdict, "What's wrong"
    * #4). Debug-only; never set on a timed path.
    */
  val ExplainKey = "spark.graft.explainMaterialize"

  def apply(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (s.conf.getOption(ExplainKey).exists(_.equalsIgnoreCase("true"))) {
      println(s"---- materialize site input plan " +
        s"(cols: ${df.columns.mkString(", ")}) ----")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    val reliable =
      s.conf.getOption(ConfKey).exists(_.equalsIgnoreCase("true"))
    if (reliable) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ConfKey=true requires sparkContext.setCheckpointDir on a " +
          "fault-tolerant filesystem")
      df.checkpoint(true)
    } else df.localCheckpoint(false)
  }

  /** `df.materialize` postfix form so call sites read like the
    * `.localCheckpoint(false)` they replace.
    */
  implicit final class Ops(private val df: DataFrame) extends AnyVal {
    def materialize: DataFrame = Materialize(df)
  }
}
