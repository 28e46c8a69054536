package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** `graft_dwithin(x1, y1, x2, y2, radius)` — the declarative
  * within-distance predicate (the reference's PostGIS
  * `ST_DWithin(a, b, r)`, changegen/db.py:102-135).
  *
  * Semantics: `sqrt((x1-x2)² + (y1-y2)²) <= radius`, evaluated and
  * codegen'd through exactly that builtin arithmetic (same float-op
  * order as `Geo.dist`), so a query using the marker is correct with
  * or without the optimizer rewrite.
  *
  * The point of the marker: PostGIS answers `ST_DWithin` joins with an
  * R-tree; naive Spark answers them with a BroadcastNestedLoopJoin —
  * an O(|L|·|R|) scale-killer. [[GridDWithinJoinRule]] recognizes the
  * predicate in a join condition and rewrites the θ-join into the
  * grid-bucket equi-join that `DWithinJoin.pointPoint` hand-builds,
  * the way PostGIS's planner picks the index plan for the same SQL.
  */
case class GraftDWithin(
    x1: Expression, y1: Expression,
    x2: Expression, y2: Expression,
    radius: Expression)
  extends Expression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dwithin expects 5 doubles, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def children: Seq[Expression] = Seq(x1, y1, x2, y2, radius)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_dwithin"

  /** The builtin-arithmetic equivalent; rebuilt per instance so bound/
    * transformed children propagate. */
  private lazy val replacement: Expression = GraftDWithin.exact(x1, y1, x2, y2, radius)

  override def eval(input: InternalRow): Any = replacement.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    replacement.genCode(ctx)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2), c(3), c(4))
}

object GraftDWithin {
  /** `sqrt((x1-x2)² + (y1-y2)²) <= r` from builtins — the same float-op
    * order as `Geo.dist`, so rewritten plans match the hand-built
    * operator (and the DuckDB oracle) bit-for-bit. */
  def exact(x1: Expression, y1: Expression, x2: Expression, y2: Expression,
            r: Expression): Expression = {
    val dx = Subtract(x1, x2)
    val dy = Subtract(y1, y2)
    LessThanOrEqual(Sqrt(Add(Multiply(dx, dx), Multiply(dy, dy))), r)
  }
}

/** Optimizer rule: rewrite an inner θ-join whose condition carries a
  * [[GraftDWithin]] conjunct (literal radius, one coordinate pair per
  * side) into the grid-bucket equi-join:
  *
  *   - the left side replicates to its cell + 8 neighbors
  *     (`explode` of a 9-element literal-offset array — constant
  *     blow-up, independent of data size),
  *   - the right side projects its single cell,
  *   - the join becomes an EQUI-join on the cell struct (sort-merge /
  *     broadcast-able, AQE-skew-splittable) with the exact distance
  *     predicate — plus any remaining conjuncts — kept as the join
  *     filter.
  *
  * Without the rule the same plan is a BroadcastNestedLoopJoin:
  * O(|L|·|R|) comparisons. With it, cost is linear in input + output,
  * the shape `DWithinJoin.pointPoint` hand-builds — here picked
  * automatically from the declarative predicate, the way PostGIS's
  * planner chooses the R-tree for `ST_DWithin`.
  *
  * Fires only when the radius is a foldable positive double and each
  * coordinate pair references exactly one join side; the rewrite
  * replaces the marker with builtin arithmetic, so it cannot re-fire
  * on its own output (the extension batch runs to fixpoint).
  */
object GridDWithinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.iterator.flatMap {
        case g: GraftDWithin => orient(g, left, right).map(o => (g, o))
        case _ => None
      }.nextOption() match {
        case Some((g, (ax, ay, bx, by, r))) =>
          rewrite(j, conjuncts.filterNot(_ eq g), ax, ay, bx, by, r)
        case None => j
      }
  }

  /** (leftX, leftY, rightX, rightY, radius) when exactly one
    * coordinate pair sits on each side and the radius folds to a
    * positive double. */
  private def orient(g: GraftDWithin, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression, Double)] = {
    if (!g.deterministic || !g.radius.foldable || g.radius.dataType != DoubleType) return None
    val r = g.radius.eval() match {
      case d: java.lang.Double if d > 0 && !d.isInfinite && !d.isNaN => d.doubleValue()
      case _ => return None
    }
    val p1 = g.x1.references ++ g.y1.references
    val p2 = g.x2.references ++ g.y2.references
    if (p1.isEmpty || p2.isEmpty) None
    else if (p1.subsetOf(left.outputSet) && p2.subsetOf(right.outputSet))
      Some((g.x1, g.y1, g.x2, g.y2, r))
    else if (p2.subsetOf(left.outputSet) && p1.subsetOf(right.outputSet))
      Some((g.x2, g.y2, g.x1, g.y1, r))
    else None
  }

  private def rewrite(j: Join, rest: Seq[Expression],
                      ax: Expression, ay: Expression,
                      bx: Expression, by: Expression, r: Double): LogicalPlan = {
    val rLit = Literal(r, DoubleType)
    def cellStruct(x: Expression, y: Expression, dx: Int, dy: Int): Expression =
      CreateNamedStruct(Seq(
        Literal("cx"), Add(Floor(Divide(x, rLit)), Literal(dx.toLong)),
        Literal("cy"), Add(Floor(Divide(y, rLit)), Literal(dy.toLong))))
    // Cost-based side choice: the 9-cell replication lands on the
    // SMALLER side (logical stats) — 9× a dimension table is noise,
    // 9× the fact table is not. Either choice is correct (each
    // qualifying pair meets exactly once: the replicated row covers
    // the 3×3 neighborhood, the other side sits in its single home
    // cell); only cost differs.
    val replicateLeft = j.left.stats.sizeInBytes <= j.right.stats.sizeInBytes
    val (repPlan, repX, repY, singlePlan, singleX, singleY) =
      if (replicateLeft) (j.left, ax, ay, j.right, bx, by)
      else (j.right, bx, by, j.left, ax, ay)
    val cells = CreateArray(
      (for (dx <- -1 to 1; dy <- -1 to 1) yield cellStruct(repX, repY, dx, dy)).toSeq)
    val cellType = cells.dataType.asInstanceOf[ArrayType].elementType
    val repCell = AttributeReference("_graft_cell_rep", cellType, nullable = true)()
    val replicated = Generate(Explode(cells), Nil, outer = false, None, Seq(repCell), repPlan)
    val homeCell = Alias(cellStruct(singleX, singleY, 0, 0), "_graft_cell_home")()
    val single = Project(singlePlan.output :+ homeCell, singlePlan)
    val newCond = (EqualTo(repCell, homeCell.toAttribute) +:
      GraftDWithin.exact(ax, ay, bx, by, rLit) +: rest).reduce(And)
    // child order flips with the side choice; join hints name sides,
    // so only keep the hint when the order is preserved
    val newJoin =
      if (replicateLeft) Join(replicated, single, Inner, Some(newCond), j.hint)
      else Join(single, replicated, Inner, Some(newCond), JoinHint.NONE)
    Project(j.output, newJoin)
  }
}
