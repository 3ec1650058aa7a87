package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{ColumnShim, DatasetShim}

/** Runtime measurement of every [[ScaleChecks.boundedDomain]] declaration:
  * for each analyzed-plan aggregate that (a) contains a buffer-all function
  * (percentile / collect / mode class) and (b) sits above a bounded-domain
  * declaration, this audit evaluates the aggregate's INPUT subtree and
  * reports the actual per-group buffer load —
  *
  *   - maxDistinct: max over groups of distinct input values (the
  *     percentile/mode buffer is a value→count map, so this IS its entry
  *     count);
  *   - maxRows: max over groups of input rows (the collect_list buffer
  *     holds every value, duplicates included).
  *
  * Run at two scale factors and compare: a TRUE declaration reads flat or
  * saturating; a FALSE one tracks the data — which is how a wrong
  * reviewed-site argument gets caught by measurement instead of re-review
  * (the same closure [[WindowAudit]] gives the BoundedBatchAlias
  * declarations via broadcast-size growth).
  *
  * Usage: runMain graft.DomainAudit [sfDir] [onlyCsv]
  * Output: one `[domain]` line per (query, declared site, function).
  */
object DomainAudit {

  /** Declarations on the UNREDUCED path below `p` — the walk stops at the
    * same reducing nodes as the static check's growing-leaf walk, so a
    * declaration belonging to a DEEPER aggregate's input is never
    * attributed to an outer aggregate whose own input is already reduced
    * (that outer site isn't check-5-relevant, and measuring its reduced
    * input under the inner declaration's label would dilute exactly the
    * false-declaration-shows-up-as-growth adjudication).
    */
  private def declarationsOnUnreducedPath(p: LogicalPlan): Seq[String] =
    p match {
      case _: Aggregate | _: Distinct | _: Deduplicate | _: GlobalLimit |
           _: LocalLimit | _: WindowGroupLimit => Nil
      case sa: SubqueryAlias
          if sa.alias.startsWith(ScaleChecks.BoundedDomainAlias) =>
        Seq(sa.alias.stripPrefix(ScaleChecks.BoundedDomainAlias + "__"))
      case other => other.children.flatMap(declarationsOnUnreducedPath)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSet)
    val wh = java.nio.file.Files.createTempDirectory("graft-domain-wh").toString
    val spark = GraftSession.hiveBuilder("local[32]", "graft-domain-audit", wh)
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var measured = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      try {
        val df = fn(spark, sfDir)
        val sites = df.queryExecution.analyzed.collect {
          case a: Aggregate =>
            val heavies = a.aggregateExpressions.flatMap(_.collect {
              case ae: AggregateExpression
                  if ScaleChecks.bufferAll(ae.aggregateFunction) =>
                ae.aggregateFunction
            })
            val decls = declarationsOnUnreducedPath(a.child)
            if (heavies.nonEmpty && decls.nonEmpty) Seq((a, heavies, decls))
            else Nil
        }.flatten
          // the same declared aggregate can appear many times in a DAG-
          // shaped plan (iterative queries re-embed their seed subtree) —
          // measure each distinct site once
          .distinctBy { case (a, heavies, _) =>
            (a.canonicalized, heavies.map(_.prettyName)) }
        sites.zipWithIndex.foreach { case ((a, heavies, decls), i) =>
          val child = DatasetShim.ofRows(spark, a.child)
          val grp = a.groupingExpressions.map(ColumnShim.column)
          heavies.distinctBy(_.prettyName).foreach { h =>
            val in = ColumnShim.column(h.children.head)
            val per =
              (if (grp.isEmpty) child.groupBy() else child.groupBy(grp: _*))
                .agg(approx_count_distinct(in).as("__d"),
                  count(in).as("__n"))
            val r = per.agg(max(col("__d")), max(col("__n")),
              count(lit(1))).head()
            measured += 1
            println(s"[domain] $name site=$i fn=${h.prettyName} " +
              s"groups=${r.getLong(2)} maxDistinct=${r.getLong(0)} " +
              s"maxRows=${r.getLong(1)} decl=${decls.head.take(56)}")
          }
        }
        spark.catalog.clearCache()
      } catch {
        case e: Exception =>
          println(s"[domain] $name FAILED: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"[domain] measured $measured declared buffer-all sites at $sfDir")
    spark.stop()
  }
}
