package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: when stacked Window operators partition by key sets
  * where one is a subset of the other (e.g. dedup by `(code, day)` feeding
  * rolling stats by `(code)`), hash-partitioning by the SMALLEST set
  * satisfies every window's ClusteredDistribution — but the planner,
  * walking bottom-up, gives the inner window its full-key exchange and
  * then must re-exchange for the outer one.
  *
  * This rule finds such stacks (looking through the Projects/Filters/Sorts
  * that sit between the Window nodes), and inserts one
  * `RepartitionByExpression` on the common subset key *below* the
  * innermost window. `EnsureRequirements` then sees its requirement
  * already satisfied at every level: the whole stack runs over a single
  * exchange. Pure optimization — row semantics are unchanged (windows
  * only need co-location + local sort, which the planner still adds).
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`); the same transformation can be written by
  * hand as `df.repartition(col(k))` (see `q_pipeline_refined`), which
  * this rule detects and leaves untouched.
  */
object ShareWindowExchange extends Rule[LogicalPlan] {

  /** The pass-through nodes the planner lets a partitioning survive. */
  private def unwrap(p: LogicalPlan): Option[LogicalPlan] = p match {
    case Project(_, child) => Some(child)
    case Filter(_, child) => Some(child)
    case Sort(_, _, child, _) => Some(child)
    case _ => None
  }

  private def attrsOf(spec: Seq[Expression]): Option[Seq[Attribute]] = {
    val as = spec.collect { case a: Attribute => a }
    if (as.length == spec.length && as.nonEmpty) Some(as) else None
  }

  /** Collect the partition specs of a window stack rooted at `p`, plus the
    * plan under the innermost window.
    */
  private def collectStack(p: LogicalPlan,
                           acc: List[Seq[Attribute]]): (List[Seq[Attribute]], LogicalPlan) =
    p match {
      case w: Window =>
        attrsOf(w.partitionSpec) match {
          case Some(as) => collectStack(w.child, as :: acc)
          case None => (acc, p)
        }
      case other =>
        unwrap(other) match {
          case Some(child) if acc.nonEmpty =>
            val (specs, base) = collectStack(child, acc)
            if (specs.length > acc.length) (specs, base) else (acc, other)
          case _ => (acc, other)
        }
    }

  /** Is the subtree under the insertion point already hash-partitioned on
    * (a subset of) `minSet`? Looks through the same pass-through nodes the
    * planner does — a user's `repartition(code)` under a Project must not
    * earn a second forced shuffle.
    */
  private def alreadyPartitioned(p: LogicalPlan, minSet: AttributeSet): Boolean = p match {
    case RepartitionByExpression(exprs, _, _, _) =>
      val as = exprs.collect { case a: Attribute => a }
      as.length == exprs.length && as.nonEmpty && AttributeSet(as).subsetOf(minSet)
    case _ => unwrap(p).exists(alreadyPartitioned(_, minSet))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case w: Window =>
      val (specs, base) = collectStack(w, Nil)
      if (specs.length < 2) w
      else {
        val minSpec = specs.minBy(_.length)
        val minSet = AttributeSet(minSpec)
        val allShareSubset = specs.forall(s => minSet.subsetOf(AttributeSet(s)))
        if (!allShareSubset || minSpec.isEmpty || alreadyPartitioned(base, minSet)) w
        else {
          // re-insert the repartition below the innermost window
          val newPlan = w.transformUp {
            case inner: LogicalPlan if inner eq base =>
              RepartitionByExpression(minSpec, inner, None)
          }
          newPlan.asInstanceOf[Window]
        }
      }
  }
}
