package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

import graft.ops.Summary
import graft.ops.Summary.SummaryInfo

/** Automatic aggregate rewrite over registered summary tables — the
  * materialized-view navigation rule (Calcite's aggregate MV rewrite,
  * re-expressed as a Spark `Rule[LogicalPlan]`).
  *
  * Matches `Aggregate [→ Filter* → Project*] → parquet scan` where the
  * scan's root paths carry a [[Summary.register]] entry, and replaces
  * the fact-table aggregation with the equivalent re-merge over the
  * summary partials — turning a 100 TB scan-and-aggregate into a
  * summary-sized one at PLANNING time, invisibly to the query author.
  *
  * Soundness gates — any miss falls back to the original plan, which
  * is always correct:
  *   - FRESHNESS: the scan's current file listing must equal the file
  *     set captured at registration (planning metadata only, the
  *     [[graft.ops.Manifest]] immutable-files argument). An appended
  *     or compacted base silently disables the rewrite until
  *     [[Summary.refreshSummary]] + re-register. Cost class: O(file
  *     count) name normalizations per candidate aggregate — the same
  *     order of planner work as the file listing the scan's
  *     FileIndex has already materialized for this query (the check
  *     reads that cache, it lists nothing itself); at metastore
  *     scales where even that is too hot, the check belongs on a
  *     table-version counter, which is exactly what a catalog with
  *     snapshot ids (Delta/Iceberg) would supply here.
  *   - GROUPING: every grouping expression is a bare dim column.
  *   - FILTERS: predicates may sit between the aggregate and the scan
  *     only if they reference dim columns alone (then they apply to
  *     summary rows identically, since dims survive verbatim).
  *   - AGGREGATES, translated to partial re-merges:
  *       COUNT(*)            → coalesce(SUM(n_rows), 0)
  *       COUNT(c)            → coalesce(SUM(cnt_c), 0)
  *       MIN(c) / MAX(c)     → MIN(min_c) / MAX(max_c)
  *       SUM(c), c integral  → SUM(sum_c) cast back (decimal partials
  *                             hold the exact integer total)
  *       SUM(CAST(c AS Fns.D)) → SUM(sum_c) cast back — the engine's
  *                             own order-independent summation shape
  *       AVG(c), c integral  → exact decimal total → double, over the
  *                             exact count. CONTRACT ENVELOPE (ADVICE
  *                             r11): bit-identical to the base plan
  *                             only while the group's running double
  *                             sum stays ≤ 2^53 (where per-addition
  *                             rounding is exact); past that the
  *                             base's own result is partition-order-
  *                             dependent, and the served value is the
  *                             exact-total rounding INSIDE that
  *                             nondeterminism envelope — a different
  *                             but equally valid double. Callers
  *                             needing bit-stability on >2^53 totals
  *                             should aggregate the Fns.D decimal
  *                             cast instead (next line), which is
  *                             exact at any scale.
  *       AVG(CAST(c AS Fns.D)) → the base's decimal-division tree
  *                             rebuilt verbatim over the partials —
  *                             bit-identical at any scale
  *     SUM over a raw DOUBLE column is deliberately NOT matched: fp
  *     addition is order-dependent, so the re-merged total would be a
  *     different (equally valid, but not bit-identical) double than
  *     the base plan's — silently changing results under a rewrite is
  *     exactly what this rule must never do. DISTINCT and FILTER'd
  *     aggregates also decline.
  *   - SHAPE: output attribute ids, names, types and nullability are
  *     preserved exactly (Alias-with-original-exprId, Cast back to the
  *     original result type, KnownNotNull where the original was
  *     non-nullable), so parent operators never notice the swap.
  *
  * Registered by [[GraftExtensions]] (cluster deployment) and usable
  * via `spark.experimental.extraOptimizations` on a live session.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (Summary.isEmpty) plan
    else plan.transformDown {
      // an optimizer rule must never make a valid query fail: any
      // surprise inside the rewrite (a registry entry whose summary
      // table was since dropped resolves with an AnalysisException,
      // a partial column missing from a hand-edited asset, ...)
      // declines to the original — always-correct — plan.
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }

  /** Peel alias/pruning-projection/filter layers down to the scan,
    * accumulating filter conditions. Only attribute-only Projects are
    * transparent (a computing Project could feed the aggregate derived
    * columns the summary does not have).
    */
  private def unwrap(p: LogicalPlan, conds: Seq[Expression] = Nil)
      : Option[(Seq[Expression], LogicalRelation)] = p match {
    case s: SubqueryAlias => unwrap(s.child, conds)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(c, conds)
    case Filter(cond, c) => unwrap(c, conds :+ cond)
    case r: LogicalRelation => Some((conds, r))
    case _ => None
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (conds, rel) <- unwrap(agg.child)
      fs <- rel.relation match {
        case f: HadoopFsRelation => Some(f)
        case _ => None
      }
      candidates = Summary.lookup(fs.location.rootPaths.map(_.toString))
      if candidates.nonEmpty
      // the scan's listing, computed once for all candidates
      current = fs.location.inputFiles.map(graft.ops.Manifest.norm).toSet
      // aggregate navigation: candidates arrive coarsest-first; the
      // first FRESH one whose dims/measures cover the query wins
      // (fewest dims = fewest partial rows = cheapest serve)
      plan <- candidates.iterator
        .filter(_.files == current)
        .flatMap(info =>
          // per-candidate containment: one dropped/broken summary
          // must not disqualify a healthy finer-grain sibling
          try translate(agg, conds, info)
          catch { case scala.util.control.NonFatal(_) => None })
        .nextOption()
    } yield plan
  }

  private def translate(agg: Aggregate, conds: Seq[Expression],
                        info: SummaryInfo): Option[LogicalPlan] = {
    // fresh attribute ids every call: the same summary may serve
    // several aggregates in one query (e.g. a self-union), and reusing
    // one analyzed subtree would duplicate ids across them. Aliases
    // are stripped here because EliminateSubqueryAliases has already
    // run by the time a late rewrite executes — an alias left in the
    // injected subtree would reach the physical planner, which cannot
    // plan one.
    val summaryPlan = stripAlias(
      SparkSession.active.table(info.summaryTable).queryExecution.analyzed)
    val sOut = summaryPlan.output.map(a => a.name -> a).toMap
    val measures = info.measures.toSet

    def dimAttr(name: String): Option[Attribute] =
      if (info.dims.contains(name)) sOut.get(name) else None

    def sumOf(partial: String): Expression =
      AggregateExpression(Sum(sOut(partial)), Complete, isDistinct = false)

    def aggOf(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)

    /** The served replacement of one base-side aggregate call, or None
      * if this aggregate cannot be answered from the partials.
      */
    def txAggFn(fn: AggregateFunction): Option[Expression] = fn match {
      case Count(Seq(l: Literal)) if l.value != null =>
        Some(Coalesce(Seq(sumOf("n_rows"), Literal(0L, LongType))))
      case Count(Seq(a: AttributeReference)) if measures(a.name) =>
        Some(Coalesce(Seq(sumOf(s"cnt_${a.name}"), Literal(0L, LongType))))
      case Min(a: AttributeReference) if measures(a.name) =>
        Some(aggOf(Min(sOut(s"min_${a.name}"))))
      case Max(a: AttributeReference) if measures(a.name) =>
        Some(aggOf(Max(sOut(s"max_${a.name}"))))
      case Sum(a: AttributeReference, _)
          if measures(a.name) && isIntegral(a.dataType) =>
        Some(sumOf(s"sum_${a.name}"))
      case Sum(Cast(a: AttributeReference, dt, _, _), _)
          if measures(a.name) && dt == graft.functions.Fns.D =>
        Some(sumOf(s"sum_${a.name}"))
      // AVG, integral input (r11): the base sums integral inputs in
      // DOUBLE (Average.sumDataType), i.e. Divide(sum.cast(double),
      // count.cast(double), LEGACY). Served: the EXACT decimal total
      // rounded to double once, divided by the exact count —
      // bit-identical wherever the base is itself deterministic
      // (total magnitude ≤ 2^53, where per-addition double rounding
      // is exact); beyond that the base's own result is partition-
      // order-dependent, and the served form is the exact-total
      // rounding inside that nondeterminism envelope.
      case Average(a: AttributeReference, _)
          if measures(a.name) && isIntegral(a.dataType) =>
        Some(Divide(
          Cast(sumOf(s"sum_${a.name}"), org.apache.spark.sql.types.DoubleType),
          Cast(sumOf(s"cnt_${a.name}"), org.apache.spark.sql.types.DoubleType),
          EvalMode.LEGACY))
      // AVG over the engine's decimal-cast shape (r11): replicate
      // Average.evaluateExpression's decimal branch EXACTLY — same
      // operand types (sumDataType for Fns.D input is bounded(28,4)
      // = Summary.SumT; count as LongDecimal), same
      // DecimalDivideWithOverflowCheck, same resultType — so the
      // served division rounds bit-identically to the base plan at
      // ANY scale (decimal partials are order-independent, unlike
      // the double path above).
      case av @ Average(Cast(a: AttributeReference, dt, _, _), evalMode)
          if measures(a.name) && dt == graft.functions.Fns.D =>
        val rt = av.dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType]
        val cnt = sumOf(s"cnt_${a.name}")
        Some(If(EqualTo(cnt, Literal(0L, LongType)),
          Literal(null, rt),
          DecimalDivideWithOverflowCheck(
            Cast(sumOf(s"sum_${a.name}"), Summary.SumT),
            // DecimalType.LongDecimal = (20, 0), private[sql]
            Cast(cnt, org.apache.spark.sql.types.DecimalType(20, 0)),
            rt, null, evalMode != EvalMode.ANSI)))
      case _ => None
    }

    def txAgg(ae: AggregateExpression): Option[Expression] =
      if (ae.isDistinct || ae.filter.isDefined) None
      else txAggFn(ae.aggregateFunction).map { served =>
        val cast =
          if (served.dataType == ae.dataType) served
          else Cast(served, ae.dataType, Some(conf.sessionLocalTimeZone))
        if (!ae.nullable && cast.nullable) KnownNotNull(cast) else cast
      }

    /** Scalar-context translation: aggregate calls via [[txAgg]], dim
      * columns to their summary twins, anything else rebuilt over
      * translated children. Non-dim columns and non-deterministic
      * expressions decline.
      */
    def tx(e: Expression): Option[Expression] = e match {
      case _ if !e.deterministic => None
      case ae: AggregateExpression => txAgg(ae)
      case a: AttributeReference => dimAttr(a.name)
      case _ if e.children.isEmpty => Some(e)
      case _ =>
        val kids = e.children.map(tx)
        if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get)))
        else None
    }

    val newGroups: Option[Seq[Expression]] =
      traverse(agg.groupingExpressions) {
        case a: AttributeReference => dimAttr(a.name)
        case _ => None
      }
    val newList: Option[Seq[NamedExpression]] =
      traverse(agg.aggregateExpressions) {
        case a: AttributeReference =>
          dimAttr(a.name).map(sa => Alias(sa, a.name)(exprId = a.exprId))
        case al @ Alias(child, name) =>
          tx(child).map(nc => Alias(nc, name)(exprId = al.exprId))
        case _ => None
      }
    val newConds: Option[Seq[Expression]] = traverse(conds)(tx)

    for {
      g <- newGroups
      l <- newList
      cs <- newConds
    } yield {
      val filtered = cs.reduceOption(And)
        .map(Filter(_, summaryPlan)).getOrElse(summaryPlan)
      Aggregate(g, l, filtered)
    }
  }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case s: SubqueryAlias => stripAlias(s.child)
    case other => other
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | LongType => true
      case _ => false
    }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val ys = xs.map(f)
    if (ys.forall(_.isDefined)) Some(ys.map(_.get)) else None
  }
}
