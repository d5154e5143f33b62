package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** RI-aware Catalyst optimizer rules, driven by the [[Constraints]] RELY
  * registry (which graft's catalog populates from its declared relations).
  * These close plan gaps Spark cannot close alone because it has no
  * uniqueness/foreign-key knowledge:
  *
  *  - [[TopNThroughRiJoin]] — `ORDER BY … LIMIT n` over an FK equi-join
  *    computes the top-N on the FK side FIRST (then joins n rows, broadcast),
  *    instead of joining the full fact table to take n rows at the end.
  *    Valid because an FK join is row-preserving-exactly-once for the FK
  *    side: each surviving FK row matches exactly one parent row.
  *  - [[CollectSizeToCount]] — `size(collect_list(e))` (and the
  *    `size(flatten(collect_list(arr)))` shape the nested-relation resolver
  *    produces) never needs the array: rewrite the aggregate to
  *    `count(e)` / `sum(size(arr))`, turning an ObjectHashAggregate that
  *    ships every element through the shuffle into a partial-aggregating
  *    HashAggregate that ships one long per group. Constraint-free.
  *  - [[RiJoinElimination]] — a join whose output only uses one side's
  *    columns is dropped entirely when RI guarantees the join changes
  *    nothing (unique right key under LEFT OUTER; declared FK under INNER).
  *
  * All three run inside the operator-optimization fixed point (injected via
  * [[GraftExtensions]]), so built-in rules (CollapseProject, column pruning,
  * limit pushdown) and these cooperate until fixpoint.
  *
  * 100 TB rationale: the pre-rule plans SCALE WRONG — a top-200 page over
  * `orders ⋈ customer` shuffles/broadcasts the whole dimension however big
  * the page is, and a nested-relation count ships every child row's struct
  * through the exchange. The rewrites make page cost proportional to the
  * page and count cost proportional to the group count, at any corpus size.
  */
object RiRules {

  /** Strip casts that are injective on the child's domain — the query API's
    * key normalizer wraps every join key in `cast(k as string)`, which
    * preserves equality/uniqueness for the integral keys it is applied to.
    * (long→string is injective; we only strip to ATTRIBUTE level for
    * constraint lookups, never to claim ordering equivalence ACROSS types.)
    */
  @annotation.tailrec
  def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other   => other
  }

  /** One side of a join, descended through row-count-preserving wrappers to
    * its base scan: Project never changes row count, ResolvedHint is
    * metadata, Filter conditions are collected for the caller to judge
    * (row-reducing filters are fine on an FK side, and fine on a PK side
    * only if they merely drop null keys).
    */
  final case class ScanSide(scan: LogicalRelation, filters: Seq[Expression]) {
    lazy val tag: Option[String] = Constraints.scanTag(scan)
    /** The scan attribute `a` resolves to, if `a` flows unchanged from the
      * scan (same exprId — our descent never passes aliasing nodes for
      * attrs it returns, so exprId identity is exact). */
    def scanAttr(a: Attribute): Option[Attribute] =
      scan.output.find(_.exprId == a.exprId)
  }

  def descendToScan(p: LogicalPlan): Option[ScanSide] = p match {
    case lr: LogicalRelation    => Some(ScanSide(lr, Nil))
    case Project(_, child)      => descendToScan(child)
    case ResolvedHint(child, _) => descendToScan(child)
    case Filter(cond, child)    =>
      descendToScan(child).map(s =>
        s.copy(filters = splitConjunctivePredicates(cond) ++ s.filters))
    case _ => None
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other     => Seq(other)
  }

  /** True iff every filter on a parent (PK) side only removes rows whose
    * join key is null — rows no FK value can reference, so totality is
    * unaffected. (The optimizer itself infers `IsNotNull(pk)` on equi-join
    * sides; anything else — a real predicate — could drop a referenced
    * parent row and must block the rewrite.)
    */
  def filtersOnlyNullKeyDrops(side: ScanSide, pkAttr: Attribute): Boolean =
    side.filters.forall {
      case IsNotNull(e) => stripCast(e) match {
        case a: Attribute => a.exprId == pkAttr.exprId
        case _            => false
      }
      case _ => false
    }

  /** The single equi pair of a join condition as (leftAttr, rightAttr) at
    * the SCAN-attribute level, or None when the condition is anything else.
    * Cast wrappers (the API's normalizer) are stripped; sides are oriented
    * by output membership.
    */
  def singleEquiPair(j: Join): Option[(Attribute, Attribute)] =
    j.condition.map(splitConjunctivePredicates) match {
      case Some(Seq(EqualTo(a, b))) =>
        (stripCast(a), stripCast(b)) match {
          case (x: Attribute, y: Attribute) =>
            if (j.left.outputSet.contains(x) && j.right.outputSet.contains(y))
              Some((x, y))
            else if (j.left.outputSet.contains(y) && j.right.outputSet.contains(x))
              Some((y, x))
            else None
          case _ => None
        }
      case _ => None
    }

  /** FK fact lookup: is `fkSide.fkAttr` a declared foreign key to
    * `pkSide.pkAttr`, with the PK declared unique? Both attrs must flow
    * unchanged from their scans.
    */
  def isDeclaredFkJoin(fkSide: ScanSide, fkAttr: Attribute,
                       pkSide: ScanSide, pkAttr: Attribute): Boolean = (for {
    fkScanAttr <- fkSide.scanAttr(fkAttr)
    pkScanAttr <- pkSide.scanAttr(pkAttr)
    fkTag <- fkSide.tag
    pkTag <- pkSide.tag
    fkC <- Constraints.get(fkTag)
    pkC <- Constraints.get(pkTag)
  } yield pkC.uniqueCols.contains(pkScanAttr.name) &&
      fkC.fks.exists(f => f.childCol == fkScanAttr.name &&
        f.parentTag == pkTag && f.parentCol == pkScanAttr.name))
    .getOrElse(false)

  /** Is `pkAttr` a declared-unique column of its (bare) side? */
  def isDeclaredUnique(side: ScanSide, pkAttr: Attribute): Boolean = (for {
    scanAttr <- side.scanAttr(pkAttr)
    tag <- side.tag
    c <- Constraints.get(tag)
  } yield c.uniqueCols.contains(scanAttr.name)).getOrElse(false)
}

/** Top-N pushdown through a declared-FK equi-join (see [[RiRules]]).
  *
  * Matches `GlobalLimit(n) ← LocalLimit ← Sort ← [Project] ← Join` where
  *  - the join is INNER on a single declared FK→unique-key equi pair (the
  *    parent side bare up to null-key filters), or LEFT OUTER with a
  *    declared-unique right key (uniqueness alone suffices: every left row
  *    yields exactly one output row, matched or null-extended);
  *  - every sort key, after substituting through the equi pair where both
  *    attrs share a data type, references only the push side.
  *
  * Rewrites the push side to `Limit(n, Sort(keys))` — planned as
  * TakeOrderedAndProject, no shuffle — and hints it as the broadcast build
  * side (n rows is the smallest thing in the query; the previous hint, if
  * any, pointed at a dimension that no longer needs to move). The outer
  * Sort/Limit stay: re-sorting n joined rows is free, and keeps the rewrite
  * oblivious to tie-breaking.
  */
object TopNThroughRiJoin extends Rule[LogicalPlan] {
  import RiRules._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(IntegerLiteral(n),
        ll @ LocalLimit(_, s @ Sort(order, true, child, _))) =>
      val rewritten = child match {
        case j: Join => pushTopN(n, order, j).map(nj => nj: LogicalPlan)
        case p @ Project(_, j: Join) =>
          pushTopN(n, order, j).map(nj => p.copy(child = nj))
        case _ => None
      }
      rewritten.map(nc => gl.copy(child = ll.copy(child = s.copy(child = nc))))
        .getOrElse(gl)
  }

  private def pushTopN(n: Int, order: Seq[SortOrder], j: Join): Option[Join] = {
    if (!order.forall(_.deterministic)) return None
    // idempotence: a side we already limited is a Limit node, which
    // descendToScan rejects — the match below then fails and we stop.
    singleEquiPair(j).flatMap { case (lKey, rKey) =>
      val tryLeft = pushable(j, pushLeft = true, lKey, rKey, order)
      lazy val tryRight = pushable(j, pushLeft = false, lKey, rKey, order)
      (tryLeft orElse tryRight).map { substOrder =>
        val pushSideIsLeft = tryLeft.isDefined
        val side = if (pushSideIsLeft) j.left else j.right
        val pushKey = if (pushSideIsLeft) lKey else rKey
        // An INNER join drops null-FK rows BEFORE the limit counts them, so
        // the pushed top-N must too (the optimizer will infer an IsNotNull
        // above the Limit later, but cannot push it through). LEFT OUTER
        // keeps null-key rows — no filter.
        val base: LogicalPlan =
          if (j.joinType == Inner) Filter(IsNotNull(pushKey), side) else side
        val limited = Limit(Literal(n), Sort(substOrder, global = true, base))
        // Hint the n-row side as the broadcast build; the OTHER side's
        // pre-existing hint is preserved (overwriting only the pushed
        // side's — a stale dimension-broadcast hint there would fight the
        // n-row build choice, but the user's hint on the probe side is
        // still their call).
        val bcast = Some(HintInfo(strategy = Some(BROADCAST)))
        if (pushSideIsLeft)
          j.copy(left = limited, hint = j.hint.copy(leftHint = bcast))
        else
          j.copy(right = limited, hint = j.hint.copy(rightHint = bcast))
      }
    }
  }

  /** If the top-N can be pushed to the given side, the sort order rewritten
    * onto that side's attributes; None otherwise. */
  private def pushable(j: Join, pushLeft: Boolean, lKey: Attribute,
                       rKey: Attribute, order: Seq[SortOrder]): Option[Seq[SortOrder]] = {
    val (pushKey, otherKey) = if (pushLeft) (lKey, rKey) else (rKey, lKey)
    val pushPlan  = if (pushLeft) j.left else j.right
    val otherPlan = if (pushLeft) j.right else j.left
    val pushOutput = pushPlan.outputSet
    // declared FK push→other, with the other (parent) side bare up to
    // null-key drops — the totality fact both the INNER validity check and
    // the LEFT OUTER substitution license need.
    lazy val fkTotal = (for {
      pkSide <- descendToScan(otherPlan)
      fkSide <- descendToScan(pushPlan)
    } yield isDeclaredFkJoin(fkSide, pushKey, pkSide, otherKey) &&
        filtersOnlyNullKeyDrops(pkSide, otherKey)).getOrElse(false)
    val valid = j.joinType match {
      case LeftOuter if pushLeft =>
        // unique right key ⇒ ≤1 match per left row ⇒ exactly one output row
        // per left row regardless of filters on the right. The push side
        // must itself be scan-shaped — this also terminates the fixed
        // point (a side we already limited no longer descends).
        descendToScan(pushPlan).isDefined &&
          descendToScan(otherPlan).exists(side => isDeclaredUnique(side, otherKey))
      case Inner =>
        // declared FK (totality) + unique parent + parent bare up to
        // null-key drops ⇒ each surviving push-side row joins exactly once.
        fkTotal
      case _ => false
    }
    if (!valid) return None
    // No substitution needed when every sort key already lives on the push
    // side — always sound once the join is valid.
    if (order.forall(_.references.subsetOf(pushOutput))) return Some(order)
    // Otherwise try evaluating sort keys on the other side's join key via
    // the equi pair. This needs VALUE equality on EVERY OUTPUT ROW, not just
    // matched rows:
    //  - INNER: every output row satisfies pushKey = otherKey — sound.
    //  - LEFT OUTER: an unmatched left row outputs NULL for the right key
    //    while its own key may be non-null, so substitution is only sound
    //    when no retained row can be unmatched-with-non-null-key: declared
    //    FK totality + a bare (null-key-drop-only) right side. Then a
    //    non-null left key always matches (keys equal) and a null left key
    //    never does (both keys NULL — same sort position).
    // Types must also match exactly: equality through the normalizer's
    // string cast does not license cross-type ORDERING claims.
    if (pushKey.dataType != otherKey.dataType) return None
    val substLicensed = j.joinType match {
      case Inner                 => true
      case LeftOuter if pushLeft => fkTotal
      case _                     => false
    }
    if (!substLicensed) return None
    val substOrder = order.map(_.transform {
      case a: Attribute if a.exprId == otherKey.exprId => pushKey
    }.asInstanceOf[SortOrder])
    if (substOrder.forall(_.references.subsetOf(pushOutput))) Some(substOrder)
    else None
  }
}

/** `size(collect_*)` → count rewrite (see [[RiRules]]). Three shapes, all
  * produced by the nested-relation resolver ([[graft.api.Relations.nested]])
  * once CollapseProject has fused the user's `select(size(rel))`:
  *
  *  - `size(collect_list(e))`            → `count(e)`  (collect_list skips
  *    nulls; count counts non-nulls — exact)
  *  - `size(collect_set(e))`             → `count(DISTINCT e)`
  *  - `size(flatten(collect_list(arr)))` → `sum(size(arr))`  (flatten of
  *    never-null elements concatenates, so lengths add)
  *
  * `sort_array` wrappers are transparent (length-preserving), and the
  * `size(coalesce(a, []))` form the left-outer attach produces becomes
  * `coalesce(cnt, 0)`. The consumer may sit directly on the aggregate or
  * above joins/projects/filters that merely pass the array attribute
  * through; the attribute must have NO other use (else the array is really
  * needed and the rewrite silently bails). Cascaded shapes (the through-
  * relation's flatten-of-collect over another collect) resolve across
  * fixed-point iterations.
  */
object CollectSizeToCount extends Rule[LogicalPlan] {
  import RiRules._

  private type ConsumerNode = LogicalPlan // Project | Aggregate

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p: Project   => rewriteConsumer(p).getOrElse(p)
    case a: Aggregate => inlineRewrite(a).orElse(rewriteConsumer(a)).getOrElse(a)
  }

  /** The fused form CollapseProject produces when size() is applied right at
    * the aggregate: `Aggregate[…, size(collect_list(e)) AS n]` — the Size
    * wraps the AggregateExpression inline, no attribute in between. */
  private def inlineRewrite(a: Aggregate): Option[Aggregate] = {
    var changed = false
    val newExprs = a.aggregateExpressions.map { ne =>
      ne.transformDown {
        case Size(x, _) if collectRewrite(x).isDefined =>
          changed = true
          Cast(collectRewrite(x).get, IntegerType)
      }.asInstanceOf[NamedExpression]
    }
    if (changed) Some(a.copy(aggregateExpressions = newExprs)) else None
  }

  /** What a candidate collect alias rewrites to. */
  private final case class Candidate(
      agg: Aggregate, alias: Alias, replacementAgg: Expression)

  private def emptyArray(e: Expression): Boolean = e match {
    case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData, _: ArrayType) =>
      arr.numElements() == 0
    case CreateArray(children, _) => children.isEmpty
    case _ => false
  }

  /** Aggregates reachable from the consumer through row-structure-neutral
    * nodes, paired with the pass-through Projects on the way (whose
    * projectLists must carry the candidate attr bare). */
  private def reachableAggregates(p: LogicalPlan): Seq[Aggregate] = p match {
    case a: Aggregate           => Seq(a)
    case Project(_, child)      => reachableAggregates(child)
    case Filter(_, child)       => reachableAggregates(child)
    case ResolvedHint(child, _) => reachableAggregates(child)
    case j: Join                => reachableAggregates(j.left) ++ reachableAggregates(j.right)
    case _                      => Nil
  }

  private def candidatesIn(agg: Aggregate): Seq[Candidate] =
    agg.aggregateExpressions.collect {
      case al @ Alias(wrapped, _) =>
        collectRewrite(wrapped).map(Candidate(agg, al, _))
    }.flatten

  /** The count-shaped replacement for a collect-shaped aggregate result
    * expression, or None. The replacement's value relates to the original by
    * `size(orig) === cast(replacement)` on every group.
    */
  private def collectRewrite(e: Expression): Option[Expression] = e match {
    case SortArray(inner, _) => collectRewrite(inner)
    case ae @ AggregateExpression(cl: CollectList, _, false, None, _) =>
      Some(AggregateExpression(Count(Seq(cl.child)), ae.mode, isDistinct = false,
        None, NamedExpression.newExprId))
    case ae @ AggregateExpression(cs: CollectSet, _, false, None, _) =>
      Some(AggregateExpression(Count(Seq(cs.child)), ae.mode, isDistinct = true,
        None, NamedExpression.newExprId))
    case Flatten(inner) => inner match {
      case ae @ AggregateExpression(cl: CollectList, _, false, None, _)
          if cl.child.dataType.isInstanceOf[ArrayType] =>
        // Coalesce to 0: a group whose arr values are ALL NULL collects an
        // empty list (collect_list skips nulls), so size(flatten(…)) is 0 —
        // but Sum over all-NULL inputs is NULL. (Count, used by the other
        // shapes, never returns NULL — no wrapper needed there.)
        Some(Coalesce(Seq(
          AggregateExpression(Sum(Size(cl.child, legacySizeOfNull = false)
            .asInstanceOf[Expression]), ae.mode, isDistinct = false,
            None, NamedExpression.newExprId),
          Literal(0L, LongType))))
      case _ => None
    }
    case _ => None
  }

  /** Does `expr` reference `a` anywhere OUTSIDE an accepted
    * `size(a)` / `size(coalesce(a, []))` position? */
  private def hasBadRef(expr: Expression, a: Attribute): Boolean = expr match {
    case Size(x, _) if sizeTarget(x, a) => false
    case ref: Attribute                 => ref.exprId == a.exprId
    case other                          => other.children.exists(hasBadRef(_, a))
  }

  private def sizeTarget(x: Expression, a: Attribute): Boolean = x match {
    case ref: Attribute => ref.exprId == a.exprId
    case Coalesce(Seq(ref: Attribute, fallback))
        if ref.exprId == a.exprId && emptyArray(fallback) => true
    case _ => false
  }

  private def rewriteConsumer(consumer: ConsumerNode): Option[LogicalPlan] = {
    val child = consumer.children.head
    val aggs = reachableAggregates(child)
    if (aggs.isEmpty) return None
    val exprs = consumer.expressions
    val picked = aggs.flatMap(candidatesIn).filter { c =>
      val a = c.alias.toAttribute
      // referenced here at least once, and never badly — here or en route
      exprs.exists(_.references.contains(a)) &&
        !exprs.exists(hasBadRef(_, a)) &&
        okOnPath(child, c.agg, a)
    }
    // one candidate per pass: applyOne swaps the aggregate NODE, so a second
    // candidate's captured node reference would dangle; the surrounding
    // fixed point re-enters for the rest.
    picked.headOption.map(applyOne(consumer, _))
  }

  /** Between consumer and the aggregate, the attr may only appear bare in
    * pass-through projectLists — never in filter conditions, join
    * conditions, or other expressions. */
  private def okOnPath(p: LogicalPlan, target: Aggregate, a: Attribute): Boolean = p match {
    case `target`          => true
    case Project(list, child) =>
      list.forall {
        case ref: AttributeReference => true
        case other                   => !other.references.contains(a)
      } && okOnPath(child, target, a)
    case Filter(cond, child) =>
      !cond.references.contains(a) && okOnPath(child, target, a)
    case ResolvedHint(child, _) => okOnPath(child, target, a)
    case j: Join =>
      !j.condition.exists(_.references.contains(a)) &&
        ((j.left.outputSet.contains(a) && okOnPath(j.left, target, a)) ||
         (j.right.outputSet.contains(a) && okOnPath(j.right, target, a)))
    case _ => false
  }

  /** Does the consumer→aggregate path null-extend the candidate attribute
    * (an outer join with the aggregate on the extended side)? The attach
    * shape (LEFT OUTER join of the collected children back onto the base)
    * hits this on every parent with no children. */
  private def nullExtendedOnPath(p: LogicalPlan, target: Aggregate, a: Attribute): Boolean = p match {
    case `target`               => false
    case Project(_, child)      => nullExtendedOnPath(child, target, a)
    case Filter(_, child)       => nullExtendedOnPath(child, target, a)
    case ResolvedHint(child, _) => nullExtendedOnPath(child, target, a)
    case j: Join =>
      val inLeft = j.left.outputSet.contains(a)
      val below =
        if (inLeft) nullExtendedOnPath(j.left, target, a)
        else nullExtendedOnPath(j.right, target, a)
      val extendedHere = j.joinType match {
        case LeftOuter  => !inLeft
        case RightOuter => inLeft
        case FullOuter  => true
        case _          => false
      }
      below || extendedHere
    case _ => false
  }

  private def applyOne(consumer: ConsumerNode, c: Candidate): ConsumerNode = {
    val a = c.alias.toAttribute
    val newAlias = Alias(c.replacementAgg, c.alias.name)()
    // The count's own output is non-nullable, but when the path crosses a
    // null-extending join the CONSUMER-side references must say nullable —
    // installing the bare (nullable=false) attribute above the join let
    // NullPropagation strip the coalesce-to-0 below, turning a childless
    // parent's 0 into NULL (caught by the sf0.1 oracle gate, round 18: a
    // zero-order customer exists there but not at sf0.01). Over-conservative
    // nullability is always safe; a false non-null claim is not.
    val newAttr0 = newAlias.toAttribute
    val newAttr =
      if (nullExtendedOnPath(consumer.children.head, c.agg, a))
        newAttr0.withNullability(true)
      else newAttr0
    // 1. swap the aggregate expression inside the aggregate node
    val newAggNode = c.agg.copy(aggregateExpressions =
      c.agg.aggregateExpressions.map {
        case al if al.exprId == c.alias.exprId => newAlias
        case other                             => other
      })
    // 2. swap the aggregate node + rewrite pass-through refs on the path
    val newChild = replaceOnPath(consumer.children.head, c.agg, newAggNode, a, newAttr)
    // 3. rewrite the consumer's size() uses
    def rewriteSizes(e: Expression): Expression = e match {
      case Size(x, _) if sizeTarget(x, a) =>
        val cnt: Expression = x match {
          case _: Attribute => newAttr
          case _            => Coalesce(Seq(newAttr, Literal(0L, LongType)))
        }
        Cast(cnt, IntegerType)
      case other => other.withNewChildren(other.children.map(rewriteSizes))
    }
    consumer match {
      case p: Project =>
        p.copy(projectList =
          p.projectList.map(ne => rewriteSizes(ne).asInstanceOf[NamedExpression]),
          child = newChild)
      case ag: Aggregate =>
        ag.copy(aggregateExpressions =
          ag.aggregateExpressions.map(ne => rewriteSizes(ne).asInstanceOf[NamedExpression]),
          child = newChild)
      case other => other
    }
  }

  private def replaceOnPath(p: LogicalPlan, target: Aggregate, replacement: Aggregate,
                            a: Attribute, newAttr: Attribute): LogicalPlan = p match {
    case `target` => replacement
    case Project(list, child) =>
      Project(list.map {
        case ref: AttributeReference if ref.exprId == a.exprId => newAttr
        case other => other
      }, replaceOnPath(child, target, replacement, a, newAttr))
    case f @ Filter(_, child) =>
      f.copy(child = replaceOnPath(child, target, replacement, a, newAttr))
    case h @ ResolvedHint(child, _) =>
      h.copy(child = replaceOnPath(child, target, replacement, a, newAttr))
    case j: Join =>
      if (j.left.outputSet.contains(a))
        j.copy(left = replaceOnPath(j.left, target, replacement, a, newAttr))
      else
        j.copy(right = replaceOnPath(j.right, target, replacement, a, newAttr))
    case other => other
  }
}

/** RI join elimination (see [[RiRules]]): `Project(cols, Join(l, r))` where
  * `cols` touches only one side becomes a project over that side alone —
  * under LEFT OUTER when the dropped right side's key is declared unique
  * (each left row survives exactly once, matched or not), under INNER when
  * additionally a declared FK guarantees every non-null key matches (the
  * null-key drop the join performed is re-added as an explicit filter).
  * References to the dropped side's KEY attribute are allowed — it is
  * value-equal to the kept side's key on every output row and gets
  * substituted (same-type keys only).
  */
object RiJoinElimination extends Rule[LogicalPlan] {
  import RiRules._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(list, j: Join) if list.forall(_.deterministic) =>
      tryEliminate(p, j).getOrElse(p)
  }

  private def tryEliminate(p: Project, j: Join): Option[Project] =
    singleEquiPair(j).flatMap { case (lKey, rKey) =>
      val refs = AttributeSet(p.projectList.flatMap(_.references))
      val sameType = lKey.dataType == rKey.dataType
      def keepSide(keepLeft: Boolean): Option[Project] = {
        val (keep, drop)       = if (keepLeft) (j.left, j.right) else (j.right, j.left)
        val (keepKey, dropKey) = if (keepLeft) (lKey, rKey) else (rKey, lKey)
        val dropRefs = refs.intersect(drop.outputSet)
        // only the dropped key may be referenced, and only when substitutable
        val substitutable = dropRefs.isEmpty ||
          (sameType && dropRefs.forall(_.exprId == dropKey.exprId))
        if (!substitutable) return None
        // declared FK keep→drop with the dropped (parent) side bare up to
        // null-key drops: needed for INNER validity, and for substituting
        // the dropped key under LEFT OUTER.
        lazy val fkTotal = (for {
          pkSide <- descendToScan(drop)
          fkSide <- descendToScan(keep)
        } yield isDeclaredFkJoin(fkSide, keepKey, pkSide, dropKey) &&
            filtersOnlyNullKeyDrops(pkSide, dropKey)).getOrElse(false)
        val valid = j.joinType match {
          case LeftOuter if keepLeft =>
            // Uniqueness alone preserves row count, but an UNMATCHED left
            // row outputs NULL for the dropped key while the kept key may
            // be non-null — so when the projection references the dropped
            // key, substitution additionally needs FK totality + a bare
            // dropped side (then non-null keys always match ⇒ keys equal;
            // null keys never match ⇒ both NULL — substitution exact).
            descendToScan(drop).exists(side => isDeclaredUnique(side, dropKey)) &&
              (dropRefs.isEmpty || fkTotal)
          case Inner => fkTotal
          case _ => false
        }
        if (!valid) return None
        val newList = p.projectList.map(_.transform {
          case a: Attribute if a.exprId == dropKey.exprId => keepKey
        }.asInstanceOf[NamedExpression])
        // INNER dropped rows with null FK; LEFT OUTER never dropped rows.
        // For a matched INNER row the dropped key was non-null, so when the
        // projection used it the substituted kept key is equally non-null.
        val newChild = j.joinType match {
          case Inner => Filter(IsNotNull(keepKey), keep)
          case _     => keep
        }
        Some(Project(newList, newChild))
      }
      keepSide(keepLeft = true) orElse keepSide(keepLeft = false)
    }
}
