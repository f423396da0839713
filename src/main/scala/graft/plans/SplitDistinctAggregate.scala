package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualNullSafe, Expression, Grouping, GroupingID, NamedExpression, RuntimeReplaceableAggregate}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Split an Aggregate that mixes DISTINCT aggregates with
  * heavy-buffered (non-hash-able) regular aggregates into two
  * aggregates joined on the grouping keys.
  *
  * Why (r21, guide §1.2 "the distributed algorithm" / §2.5): Spark
  * plans `count(DISTINCT x)` alongside regular aggregates by expanding
  * the input (one copy per distinct group + one for the regular aggs)
  * and aggregating the expanded stream keyed by (group keys, gid,
  * distinct value) — a near-row-count group cardinality. When any
  * regular aggregate's buffer disqualifies `HashAggregateExec`
  * (string min/max, quantileExact, any TypedImperativeAggregate), that
  * whole first-phase aggregate runs as ObjectHashAggregate — which
  * falls back to SORT-BASED aggregation past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128)
  * distinct keys, i.e. always, at any real scale. Measured on
  * q_ch_bits at sf1: the parts (two uniqExact ≈ 2.2 s, the min/max
  * and countIf block ≈ 1.2 s) sum to a third of the combined query
  * (10.6 s) — the combination sorts the whole expanded stream.
  *
  * The rewrite keeps the distinct aggregates in one Aggregate (its
  * expanded first phase then carries NO aggregation buffers at all —
  * pure codegen'd hash dedup on fixed-width keys) and moves every
  * regular aggregate to a second Aggregate over the same child (group
  * count = the final output cardinality, where the object hash map
  * stays hash-based), then joins the two group-keyed one-row-per-group
  * sides back with null-safe equality (cross join for a global
  * aggregate: both sides are exactly one row). At 100 TB this trades
  * one extra narrow scan for not sort-shuffling a 2-3× expanded copy
  * of the corpus.
  *
  * Semantics are identical by construction: both sides aggregate the
  * same child with the same grouping expressions, so the join pairs
  * exactly the original groups (inner + null-safe ≡ the original
  * group set; a global aggregate yields one row on each side even on
  * empty input). The rewrite fires only when every expression in
  * scope is deterministic, never under grouping sets (Expand child /
  * grouping metadata), and restores the original output names and
  * expression ids, so downstream operators resolve unchanged.
  *
  * Applied by [[graft.sql.QueryGuard]] on the ANALYZED plan (before
  * any optimizer batch), like [[graft.functions.WrapArith]]. The
  * re-analysis inside Dataset.ofRows re-checks the rewritten plan.
  */
object SplitDistinctAggregate extends Rule[LogicalPlan] {

  /** The function whose buffer actually executes: a
    * RuntimeReplaceableAggregate (the CH min/max/max_by dispatch)
    * never runs itself — and throws from aggBufferAttributes — so
    * look through to its replacement. */
  private def effectiveFn(f: AggregateFunction): AggregateFunction =
    f match {
      case r: RuntimeReplaceableAggregate => r.replacement match {
        case g: AggregateFunction => effectiveFn(g)
        case _ => f // replacement is a full expression: stay conservative
      }
      case other => other
    }

  /** Would this aggregate's buffer disqualify HashAggregateExec and
    * (past 128 groups) demote the stage to sort-based aggregation? */
  private def heavy(ae: AggregateExpression): Boolean = {
    val f = effectiveFn(ae.aggregateFunction)
    f.isInstanceOf[TypedImperativeAggregate[_]] ||
      (!f.isInstanceOf[RuntimeReplaceableAggregate] &&
        !Aggregate.supportsHashAggregate(f.aggBufferAttributes, Nil))
  }

  private def deterministicPlan(p: LogicalPlan): Boolean =
    p.collectFirst {
      case q if !q.expressions.forall(_.deterministic) => q
    }.isEmpty

  private def aggsOf(a: Aggregate): Seq[AggregateExpression] = {
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[Expression, AggregateExpression]
    a.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression =>
        if (!seen.contains(ae.canonicalized)) seen(ae.canonicalized) = ae
      case _ =>
    })
    seen.values.toSeq
  }

  private def eligible(a: Aggregate): Boolean = {
    if (!a.resolved || a.child.isInstanceOf[Expand]) return false
    if ((a.groupingExpressions ++ a.aggregateExpressions).exists(_.exists {
      case _: Grouping | _: GroupingID => true
      case _ => false
    })) return false
    val aes = aggsOf(a)
    val (d, n) = aes.partition(_.isDistinct)
    d.nonEmpty && n.nonEmpty && n.exists(heavy) &&
      a.groupingExpressions.forall(_.deterministic) &&
      a.aggregateExpressions.forall(_.deterministic) &&
      deterministicPlan(a.child)
  }

  private def split(a: Aggregate): LogicalPlan = {
    val (dAggs, nAggs) = aggsOf(a).partition(_.isDistinct)

    def side(aggs: Seq[AggregateExpression], tag: String)
        : (Aggregate, Seq[Attribute], Map[Expression, Attribute]) = {
      val gAl = a.groupingExpressions.zipWithIndex.map { case (ge, i) =>
        Alias(ge, s"_${tag}_g$i")()
      }
      val aAl = aggs.zipWithIndex.map { case (ae, i) =>
        Alias(ae, s"_${tag}_a$i")()
      }
      (Aggregate(a.groupingExpressions, gAl ++ aAl, a.child),
        gAl.map(_.toAttribute),
        aggs.map(_.canonicalized).zip(aAl.map(_.toAttribute)).toMap)
    }

    val (dSide, dG, dMap) = side(dAggs, "d")
    val (nSide, nG, nMap) = side(nAggs, "n")
    val cond = dG.zip(nG).map { case (l, r) =>
      EqualNullSafe(l, r): Expression
    }.reduceOption(And)
    val join = Join(dSide, nSide,
      if (cond.isEmpty) Cross else Inner, cond, JoinHint.NONE)

    val gMap: Map[Expression, Attribute] =
      a.groupingExpressions.map(_.canonicalized).zip(dG).toMap
    val out: Seq[NamedExpression] = a.aggregateExpressions.map { ne =>
      val rewritten = ne.transformDown {
        case ae: AggregateExpression =>
          dMap.getOrElse(ae.canonicalized, nMap(ae.canonicalized))
        case e if gMap.contains(e.canonicalized) => gMap(e.canonicalized)
      }
      rewritten match {
        case al: Alias if al.exprId == ne.exprId => al
        case other =>
          Alias(other, ne.name)(exprId = ne.exprId, qualifier = ne.qualifier)
      }
    }
    val projected = Project(out, join)
    // an output expression that still references the child directly
    // (no matching grouping expression) would leave a dangling
    // reference — bail out to the original plan rather than build an
    // invalid one
    if (projected.missingInput.nonEmpty) a else projected
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a: Aggregate if eligible(a) => split(a)
  }
}
