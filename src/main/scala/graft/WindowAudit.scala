package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Runtime plan audit: executes every SparkEntry query and records how many
  * rows actually feed each SINGLE-PARTITION window (the "No Partition
  * Defined" WindowExec class). A global window is scale-safe only when its
  * input is bounded by construction — a rank<=k filter Catalyst rewrites to
  * TakeOrdered below the window, or a small aggregate (quantile grids,
  * per-group summaries). This audit turns that claim from a comment into a
  * measured number per query.
  *
  * AQE is disabled for the audit session so the executed plan is a plain
  * tree whose node metrics are directly traversable; AQE never changes a
  * window's required distribution, so the single-partition verdict is the
  * same one production plans face.
  *
  * Usage: runMain graft.WindowAudit [sfDir] [rowThreshold]
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toLong).getOrElse(5000L)
    val only = args.lift(2).map(_.split(",").toSet)
    val wh = java.nio.file.Files.createTempDirectory("graft-audit-wh").toString
    val spark = GraftSession.hiveBuilder("local[32]", "graft-window-audit", wh)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // rows reaching `p`: descend through 1:1 row-preserving nodes until a
    // node that reports output rows
    def inputRows(p: SparkPlan): Option[Long] = {
      def rowsOf(n: SparkPlan): Option[Long] = n match {
        case s: ShuffleExchangeExec =>
          s.metrics.get("numOutputRows").orElse(
            s.metrics.get("shuffleRecordsWritten")).map(_.value)
            .orElse(rowsOf(s.child))
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          rowsOf(r.child) // metrics live on the original exchange
        case t: TakeOrderedAndProjectExec => // emits at most `limit` rows
          Some(math.min(t.limit.toLong,
            rowsOf(t.child).getOrElse(Long.MaxValue)))
        case g: GlobalLimitExec =>
          Some(math.min(g.limit.toLong,
            rowsOf(g.child).getOrElse(Long.MaxValue)))
        case u: UnionExec =>
          val parts = u.children.map(rowsOf)
          if (parts.forall(_.isDefined)) Some(parts.flatten.sum) else None
        case _ =>
          n.metrics.get("numOutputRows").map(_.value).orElse(n match {
            case u: UnaryExecNode => rowsOf(u.child)
            case _ => None
          })
      }
      rowsOf(p)
    }

    var worst = List.empty[(String, Long, String)]
    var audited = 0
    var failed = List.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan
        val globals = plan.collectWithSubqueries {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            (w, inputRows(w.child))
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            (w, inputRows(w.child))
        }
        audited += globals.size
        // threshold < 0: dump every measurement (for cross-sf growth
        // comparison — a bounded window's input must not scale with data)
        if (threshold < 0 && globals.nonEmpty) {
          val mx = globals.map(_._2.getOrElse(-1L)).max
          println(s"[dump] $name $mx")
        }
        for ((w, rowsOpt) <- globals) {
          val rows = rowsOpt.getOrElse(-1L)
          if (rows > threshold || rows < 0) {
            val chain = Iterator.iterate(Option(w.asInstanceOf[SparkPlan])) {
              case Some(u: UnaryExecNode) => Some(u.child)
              case _ => None
            }.takeWhile(_.isDefined).flatten.take(8)
              .map(_.nodeName).mkString(" <- ")
            worst ::= ((name, rows, chain))
          }
        }
        spark.catalog.clearCache()
      } catch {
        case e: Exception => failed ::= s"$name: ${e.getMessage.take(120)}"
      }
    }
    println(s"[audit] single-partition windows audited: $audited")
    println(s"[audit] over threshold ($threshold rows at $sfDir) " +
      s"or unmeasured: ${worst.size}")
    worst.sortBy(-_._2).foreach { case (q, r, n) =>
      println(f"[audit]   $q%-32s $r%10d rows into $n")
    }
    if (failed.nonEmpty) {
      println(s"[audit] FAILED queries: ${failed.size}")
      failed.foreach(f => println(s"[audit]   $f"))
    }
    spark.stop()
  }
}
