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

  /** Resolve the chunk-bound attributes from the SAME source node that
    * produced the generator's inputs — never by name over the whole child
    * output. The generator's blob argument is traced to the deepest plan
    * node carrying it (the chunk relation); t0/t_max are taken from THAT
    * node's output and must still be visible (same exprId) at the
    * Generate's child, so a joined/derived/renamed t0 from anywhere else
    * can never be mistaken for a chunk time bound (round-1 advice). When
    * the binding fails the rule no-ops: decode stays correct, just
    * unpruned.
    */
  private def chunkBounds(g: Generate): Option[(Attribute, Attribute)] = {
    import org.apache.spark.sql.types._
    // generator inputs must be plain (n, blob, crc) attributes
    val blobAttr = g.generator.children match {
      case Seq(n: Attribute, b: Attribute, c: Attribute)
        if n.name == "n" && b.name == "blob" && c.name == "crc" => Some(b)
      case _ => None
    }
    def deepest(p: LogicalPlan, a: Attribute): Option[LogicalPlan] =
      p.children.flatMap(deepest(_, a)).headOption
        .orElse(if (p.output.exists(_.semanticEquals(a))) Some(p) else None)
    for {
      blob <- blobAttr
      src <- deepest(g.child, blob)
      t0 <- src.output.find(a => a.name == "t0" && a.dataType == LongType)
      tMax <- src.output.find(a => a.name == "t_max" && a.dataType == LongType)
      if g.child.output.exists(_.semanticEquals(t0)) &&
        g.child.output.exists(_.semanticEquals(tMax))
    } yield (t0, tMax)
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
      (t0, tMax) <- chunkBounds(g)
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
