package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Collect, CollectTopK, ImperativeAggregate, Median, Mode, PercentileBase, PercentileCont}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Structural (no-execution) scale-shape checks shared by Verify, the
  * runtime plan audit ([[WindowAudit]]), and the fast spec layer.
  *
  * The property each check guards is the one class of plan that is green at
  * bench scale and fatal at the 100 TB target:
  *
  *   1. HINT-FORCED broadcast of an UNREDUCED scale-growing relation — an
  *      explicit `broadcast()` overrides the planner's size-based choice at
  *      ANY size, so a hint on a projection/filter of `part`/`lineitem`/…
  *      that is harmless at sf0.1 becomes a driver OOM at 1000 executors.
  *      Planner-chosen broadcasts are exempt (they flip to shuffle joins on
  *      their own once stats cross the threshold), as are hints on relations
  *      reduced by an aggregate/limit/top-k below the hint (their actual
  *      bound is measured by the cross-sf runtime audit, which this static
  *      walk cannot know).
  *   2. Single-partition window over an unreduced growing relation — every
  *      row funnels through one task. Bounded shapes (rank<=k rewritten to
  *      WindowGroupLimit/TakeOrdered below the window, aggregates, calendar
  *      series) pass because the reduction node sits on the leaf path.
  *   3. Join with NO condition (cross/cartesian) where BOTH sides are
  *      unreduced growing relations — O(n^2) work that no planner rewrite
  *      saves. Stat folds (1-row aggregates) and bounded grids pass.
  *
  * "Unreduced" is a leaf-path property: a growing leaf counts only if the
  * path from the checked node down to it crosses NO cardinality-reducing
  * node (Aggregate / Distinct / Deduplicate / limits / WindowGroupLimit).
  * Grouped aggregates on high-cardinality keys are deliberately passed here
  * — their growth is what the cross-sf RUNTIME audit measures; this layer
  * exists to catch the hint-forced-unreduced class machine-checkably (the
  * r5 gap: a regex guard saw `broadcast(t(s,dir,"part"))` but not
  * `val brands = t(s,dir,"part").select(…); broadcast(brands)`).
  */
object ScaleChecks {

  /** Tables whose row count tracks the scale factor. region/nation are
    * fixed-size dimensions and legitimately broadcastable at any scale.
    */
  val growingTables: Set[String] =
    Set("customer", "part", "supplier", "orders", "lineitem", "events",
      "documents", "embeddings")

  private def stripExt(name: String): String = {
    val i = name.indexOf('.')
    if (i < 0) name else name.substring(0, i)
  }

  /** The growing source table behind a leaf, if any. Matches parquet scan
    * paths (`…/part.parquet`) and catalog table identifiers.
    */
  private def growingLeaf(leaf: LogicalPlan): Seq[String] = leaf match {
    case l: LogicalRelation =>
      val fromPath = l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(p => stripExt(p.getName)).toSeq
        case _ => Nil
      }
      val fromCat = l.catalogTable.map(t => stripExt(t.identifier.table)).toSeq
      (fromPath ++ fromCat).filter(growingTables)
    case h: HiveTableRelation =>
      Seq(stripExt(h.tableMeta.identifier.table)).filter(growingTables)
    case _ => Nil
  }

  /** Subquery-alias prefix that declares a CONTRACT-BOUNDED relation: an
    * engine operator whose semantics require replicating a caller-supplied
    * small batch (brute-force scoring, incremental-dedup batch, IVF query
    * side) tags that side `df.as(BoundedBatchAlias)` next to a scaladoc
    * line stating the contract. The alias is plan-visible, so this static
    * gate can honor the declaration, the hygiene spec can enforce that only
    * engine code (never the query gallery) declares it, and the cross-sf
    * RUNTIME broadcast audit still measures the declared side — a false
    * declaration shows up there as growth.
    */
  val BoundedBatchAlias = "__graft_bounded_batch"

  /** Growing leaves reachable from `p` with no cardinality-reducing node on
    * the path. Local one-row relations, ranges, and fixed dims yield Nil.
    */
  def unreducedGrowing(p: LogicalPlan): Seq[String] = p match {
    case _: Aggregate | _: Distinct | _: Deduplicate | _: GlobalLimit |
         _: LocalLimit | _: WindowGroupLimit => Nil
    case a: SubqueryAlias if a.alias.startsWith(BoundedBatchAlias) => Nil
    case leaf if leaf.children.isEmpty => growingLeaf(leaf)
    case other => other.children.flatMap(unreducedGrowing)
  }

  /** Check 1: hint-forced broadcasts of unreduced growing relations, from
    * the ANALYZED plan (the optimizer erases ResolvedHint into join hints).
    * Returns one message per offending hint.
    */
  def hintForcedGrowingBroadcasts(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        unreducedGrowing(h.child).distinct
    }.flatten.map(t => s"hint-forced broadcast of unreduced growing table $t")

  /** Checks 2+3 on the OPTIMIZED logical plan (after distinct→Aggregate and
    * WindowGroupLimit insertion, so bounded shapes read as bounded).
    */
  def unboundedShapes(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    val wins = plan.collect {
      case w: Window if w.partitionSpec.isEmpty =>
        unreducedGrowing(w.child).distinct
          .map(t => s"single-partition window over unreduced growing table $t")
    }.flatten
    val crosses = plan.collect {
      case j: Join if j.condition.isEmpty =>
        val l = unreducedGrowing(j.left).distinct
        val r = unreducedGrowing(j.right).distinct
        if (l.nonEmpty && r.nonEmpty)
          Seq(s"conditionless join of unreduced growing tables " +
            s"${l.mkString("+")} x ${r.mkString("+")}")
        else Nil
    }.flatten
    wins ++ crosses
  }

  /** Check 4: an aggregate mixing a DISTINCT aggregate with a buffer-heavy
    * (imperative) sibling over an unreduced growing relation. Spark's
    * distinct rewrite evaluates every sibling aggregate in a first
    * aggregate keyed by (group, distinct-col) — so an HLL / percentile /
    * collect sibling allocates ONE BUFFER PER DISTINCT KEY. Measured on the
    * f30 relational scale-up (18M rows, 600k distinct keys): exact-distinct
    * alone 74 CPU-s, HLL alone 7.5, combined in one agg 470 — a
    * 6x-the-sum-of-parts blowup that grows with key cardinality
    * (BENCH_NOTES_r6 §7; the q66 finding). Cheap declarative siblings
    * (sum/count/avg/min/max) pass — their per-key partial state is a few
    * bytes, which is the standard distinct-rewrite plan. Checked on the
    * ANALYZED plan, before RewriteDistinctAggregates erases the shape.
    */
  def distinctRewriteHeavySibling(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case a: Aggregate =>
        val aggs = a.aggregateExpressions.flatMap(_.collect {
          case ae: AggregateExpression => ae
        })
        val heavy = aggs.filter(ae => !ae.isDistinct &&
          ae.aggregateFunction.isInstanceOf[ImperativeAggregate])
        if (aggs.exists(_.isDistinct) && heavy.nonEmpty &&
            unreducedGrowing(a.child).nonEmpty)
          heavy.map(h => "distinct rewrite allocates a " +
            s"${h.aggregateFunction.prettyName} buffer per distinct key " +
            "(split into a pre-deduplicating aggregate instead)")
        else Nil
    }.flatten

  /** Subquery-alias prefix that declares a BOUNDED VALUE DOMAIN: the
    * buffer-all aggregates checked by [[bufferAllOverGrowing]] (builtin
    * `percentile` family, `collect_list`/`collect_set`, `mode`) buffer one
    * entry per DISTINCT INPUT VALUE per group — bounded and cheap on a
    * discrete domain (integer day gaps, cent-quantized price grids,
    * calendar buckets), a single-task memory bomb on a continuous one
    * (ratios, scores, measurements), where distinct ≈ rows. Row-count
    * reductions on the leaf path already pass the walk; this alias is the
    * carve-out for the remaining legitimate class: an UNREDUCED input
    * whose value domain is bounded by construction. Declare it with
    * [[boundedDomain]] at the aggregate's input, with a reason naming the
    * domain and its bound. The declaration is plan-visible, so this static
    * gate honors it, the hygiene spec enforces that every gallery
    * declaration carries a literal reason, and [[graft.DomainAudit]]
    * measures each declared site's ACTUAL max-per-group distinct count
    * across scale factors — a false declaration shows up there as growth.
    *
    * Deliberately distinct from [[BoundedBatchAlias]]: a bounded domain
    * does NOT bound row count, so checks 1-3 ignore this alias.
    */
  val BoundedDomainAlias = "__graft_bounded_domain"

  /** Global cap applied when a declaration names no explicit budget:
    * 2M buffer entries ≈ 64 MB of value→count map in one task — the
    * largest per-group buffer the engine accepts without an argued,
    * site-specific ceiling.
    */
  val DefaultDomainBudget = 2000000L

  /** Declare that `df`'s value domain feeding a buffer-all aggregate
    * directly above is bounded by construction (see [[BoundedDomainAlias]]).
    * `why` must name the domain and its bound — it is embedded in the
    * plan-visible alias (sanitized) so plan dumps and the domain audit can
    * attribute the declaration without reading the source.
    *
    * `budget` is the declaration's MACHINE-READABLE bound: the maximum
    * per-group buffer entry count (distinct values for the percentile/mode
    * class, rows for the collect class) this site's argument permits. It is
    * embedded in the alias and ENFORCED by [[graft.DomainAudit]], which
    * exits non-zero when a measured site exceeds its budget at the audit
    * scale factor — so a declaration that turns false at scale becomes a
    * red round, not a notes-table entry someone has to read. Sites with an
    * argued ceiling (a value grid, a calendar span) set it explicitly;
    * the default is the global [[DefaultDomainBudget]] cap.
    */
  def boundedDomain(df: DataFrame, why: String,
                    budget: Long = DefaultDomainBudget): DataFrame = {
    require(why.trim.length >= 16,
      "bounded-domain declaration needs a concrete reason naming the " +
        s"domain and its bound, got: '$why'")
    require(budget > 0, s"bounded-domain budget must be positive: $budget")
    val slug = why.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_").take(64)
    df.as(BoundedDomainAlias + "__b" + budget + "__" + slug)
  }

  /** Parse a [[BoundedDomainAlias]] alias back into (budget, reason slug).
    * Aliases written before budgets existed carry no `__b<N>` segment and
    * get the global default.
    */
  private[graft] def parseDomainDecl(alias: String): (Long, String) = {
    val rest = alias.stripPrefix(BoundedDomainAlias + "__")
    val budgeted = "^b(\\d+)__(.*)$".r
    rest match {
      case budgeted(b, slug) => (b.toLong, slug)
      case slug => (DefaultDomainBudget, slug)
    }
  }

  /** A buffer-all aggregate: its per-group buffer holds one entry per
    * distinct input value (percentile family, mode) or per input row
    * (collect_list / listagg) — O(group payload), not O(1). CollectTopK is
    * exempt (bounded priority queue of k); the sketches
    * (approx_percentile / HLL / CountMin / histogram_numeric) never enter —
    * their buffers are accuracy-bounded by construction.
    */
  private[graft] def bufferAll(fn: AggregateFunction): Boolean = fn match {
    case _: CollectTopK => false
    case _: PercentileBase | _: Collect[_] | _: Mode => true
    // RuntimeReplaceable wrappers around Percentile: still the analyzed
    // plan's aggregateFunction, replaced only during optimization
    case _: Median | _: PercentileCont => true
    case _ => false
  }

  /** Like [[unreducedGrowing]], but a [[BoundedDomainAlias]] declaration
    * also terminates the walk — used ONLY by check 5, where the buffered
    * payload is the distinct-value set, not the row count.
    */
  private def undeclaredUnreducedGrowing(p: LogicalPlan): Seq[String] =
    p match {
      case _: Aggregate | _: Distinct | _: Deduplicate | _: GlobalLimit |
           _: LocalLimit | _: WindowGroupLimit => Nil
      case a: SubqueryAlias if a.alias.startsWith(BoundedBatchAlias) ||
          a.alias.startsWith(BoundedDomainAlias) => Nil
      case leaf if leaf.children.isEmpty => growingLeaf(leaf)
      case other => other.children.flatMap(undeclaredUnreducedGrowing)
    }

  /** Check 5: a buffer-all aggregate (percentile / collect / mode class)
    * over an unreduced growing relation with no bounded-domain
    * declaration. The builtin percentile's buffer is a value→count map in
    * ONE task per group — bounded by distinct values, so it is the right
    * (and, measured at f30, 2-4x cheaper) tool for discrete domains, and a
    * single-task memory bomb on continuous ones where distinct ≈ rows
    * (the q222/q507/q573/q596 class the f30 CPU column caught; those sites
    * are on [[graft.ops.PrefixSum.exactPercentiles]]). This check forces
    * every remaining site to either reduce its input first, declare its
    * domain bound via [[boundedDomain]] (measured by [[graft.DomainAudit]]),
    * or switch to the two-phase exact path. Checked on the ANALYZED plan —
    * the optimizer erases both SubqueryAlias declarations and (for
    * median/percentile_cont) the RuntimeReplaceable shell.
    *
    * Scope: Aggregate nodes. Window frames buffer per-frame, not
    * per-group; unbounded-frame windows over growing inputs are check 2's
    * and the runtime window audit's territory.
    *
    * Two-plan confirmation: a hit on the analyzed plan is confirmed
    * against the OPTIMIZED plan before it flags — reductions the
    * optimizer itself inserts (a `rank <= k` filter rewritten to
    * WindowGroupLimit, the q56 shape) are invisible at analysis time, and
    * flagging them would force declarations onto already-bounded inputs.
    * The converse erasure (optimization drops SubqueryAlias declarations
    * and unwraps median/percentile_cont) is why the declaration-aware
    * side must stay on the analyzed plan.
    */
  def bufferAllOverGrowing(df: DataFrame): Seq[String] = {
    def hits(plan: LogicalPlan,
             growing: LogicalPlan => Seq[String]): Seq[(String, Set[String])] =
      plan.collect {
        case a: Aggregate =>
          val heavy = a.aggregateExpressions.flatMap(_.collect {
            case ae: AggregateExpression if bufferAll(ae.aggregateFunction) =>
              ae.aggregateFunction.prettyName
          })
          if (heavy.isEmpty) Nil
          else {
            val g = growing(a.child).toSet
            if (g.nonEmpty) heavy.distinct.map(fn => (fn, g)) else Nil
          }
      }.flatten
    val analyzed =
      hits(df.queryExecution.analyzed, undeclaredUnreducedGrowing).distinct
    if (analyzed.isEmpty) Nil
    else {
      // median/percentile_cont optimize into plain percentile — accept the
      // replacement name when confirming
      def names(fn: String): Set[String] = fn match {
        case "median" | "percentile_cont" => Set(fn, "percentile")
        case other => Set(other)
      }
      val optimized = hits(df.queryExecution.optimizedPlan, unreducedGrowing)
      analyzed.filter { case (fn, g) =>
        optimized.exists(o => names(fn).contains(o._1) && (o._2 & g).nonEmpty)
      }.map { case (fn, g) =>
        s"buffer-all aggregate $fn over unreduced growing table " +
          s"${g.toSeq.sorted.mkString("+")} without a bounded-domain " +
          "declaration (reduce first, declare via ScaleChecks.boundedDomain, " +
          "or use PrefixSum.exactPercentiles)"
      }
    }
  }

  /** All static violations for one query plan. Cheap: analysis +
    * optimization only, no job runs.
    */
  def staticViolations(df: DataFrame): Seq[String] =
    hintForcedGrowingBroadcasts(df) ++ unboundedShapes(df) ++
      distinctRewriteHeavySibling(df) ++ bufferAllOverGrowing(df)
}
