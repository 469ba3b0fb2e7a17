package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Index-aware chunk pruning (SURVEY.md §4.3 "optional v2" promoted):
  * rewrite time predicates on the DECODED `ts` into chunk-level
  * predicates on the chunk table's `(t0, t_max)` columns, below the
  * Generate:
  *
  *   Filter(ts >= L && ts < U, Generate(gorilla_explode(...), chunks))
  *     ==> Filter(ts >= L && ts < U,
  *           Generate(..., Filter(t_max >= L && t0 < U, chunks)))
  *
  * A chunk covers [t0, t_max], so `ts >= L` can only be satisfied by
  * chunks with `t_max >= L`, and `ts < U` by chunks with `t0 < U`. The
  * exact row filter stays on top; the injected chunk filter is then
  * pushed into the Parquet scan by the standard pushdown rules, where it
  * prunes at row-group level via column statistics — whole time ranges
  * are skipped without a single blob being read or CRC-checked.
  */
object PruneChunksByTime extends Rule[LogicalPlan] with PredicateHelper {

  private def derive(
      pred: Expression,
      ts: Attribute,
      t0: Attribute,
      tMax: Attribute): Option[Expression] = pred match {
    case GreaterThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(ts) =>
      Some(GreaterThanOrEqual(tMax, l))
    case GreaterThan(a: Attribute, l: Literal) if a.semanticEquals(ts) =>
      Some(GreaterThan(tMax, l))
    case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(ts) =>
      Some(LessThanOrEqual(t0, l))
    case LessThan(a: Attribute, l: Literal) if a.semanticEquals(ts) =>
      Some(LessThan(t0, l))
    case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(ts) =>
      Some(And(LessThanOrEqual(t0, l), GreaterThanOrEqual(tMax, l)))
    // literal-on-left mirrors
    case GreaterThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(ts) =>
      Some(LessThanOrEqual(t0, l))
    case GreaterThan(l: Literal, a: Attribute) if a.semanticEquals(ts) =>
      Some(LessThan(t0, l))
    case LessThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(ts) =>
      Some(GreaterThanOrEqual(tMax, l))
    case LessThan(l: Literal, a: Attribute) if a.semanticEquals(ts) =>
      Some(GreaterThan(tMax, l))
    case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(ts) =>
      Some(And(LessThanOrEqual(t0, l), GreaterThanOrEqual(tMax, l)))
    case _ => None
  }

  /** Chunk-level conjunction derivable from `cond`, minus predicates the
    * child filter already carries; None when nothing new can be injected.
    */
  private def chunkCond(
      cond: Expression,
      g: Generate): Option[Expression] = {
    val ts = g.generatorOutput.head
    val child = g.child
    for {
      t0 <- child.output.find(_.name == "t0")
      tMax <- child.output.find(_.name == "t_max")
      existing = child match {
        case Filter(c, _) => splitConjunctivePredicates(c)
        case _ => Nil
      }
      fresh = splitConjunctivePredicates(cond)
        .flatMap(derive(_, ts, t0, tMax))
        .filterNot(d => existing.exists(_.semanticEquals(d)))
      if fresh.nonEmpty
    } yield fresh.reduce(And)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // right after analysis the tree is Filter(Project(Generate(...))) —
    // the projection only passes generator outputs through (exprIds are
    // preserved for non-aliased columns), so the ts in `cond` IS the
    // generator's ts attribute
    case f @ Filter(cond, p @ Project(_,
        g @ Generate(_: GorillaExplode, _, _, _, genOut, _)))
        if genOut.nonEmpty =>
      chunkCond(cond, g) match {
        case Some(c) =>
          f.copy(child = p.copy(child = g.copy(child = Filter(c, g.child))))
        case None => f
      }
    case f @ Filter(cond,
        g @ Generate(_: GorillaExplode, _, _, _, genOut, _))
        if genOut.nonEmpty =>
      chunkCond(cond, g) match {
        case Some(c) => f.copy(child = g.copy(child = Filter(c, g.child)))
        case None => f
      }
  }
}
