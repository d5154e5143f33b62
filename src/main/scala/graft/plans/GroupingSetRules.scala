package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Pre-aggregate below a grouping-sets Expand when the finest grain is
  * declared small.
  *
  * Spark lowers `rollup/cube/GROUPING SETS` to
  * `Aggregate(keys :+ gid, aggs, Expand(child))` where the Expand REPLICATES
  * every input row once per grouping set (ROLLUP(a,b) = 3×, CUBE(a,b) = 4×)
  * before any aggregation happens — at 100 TB that is the difference between
  * scanning the data once and materializing it three times into the
  * aggregate's hash map. When every aggregate is re-aggregable and the
  * grouping keys have declared-small domains (RELY NDV bounds,
  * [[Constraints.TableConstraints.ndv]]), the algebraic identity
  *
  *   agg_gs(keys_gs, f(x), Expand(rows)) =
  *     agg_gs(keys_gs, f'(p), Expand(agg(keys_all, p = partial(f)(x), rows)))
  *
  * lets the heavy input aggregate ONCE at the finest grain (≤ the declared
  * NDV product rows come out) and the Expand replicate only that tiny
  * intermediate. Re-aggregation must be EXACT, so the rewrite is licensed
  * only for:
  *
  *   - `count` → `sum` of partial counts (never-null, coalesced to 0);
  *   - `sum` over integral types (wrapping add is associative) and decimals
  *     (exact; final cast back to the original result type);
  *   - `min` / `max` (idempotent semilattice);
  *   - [[Decimal128Sum]] → [[Decimal128SumPartial]] / [[Decimal128SumMerge]]
  *     (the exact 128-bit state re-merges; re-adding the per-group DOUBLES
  *     would break bit-parity with the single-phase plan).
  *
  * `sum(double)` is deliberately NOT licensed: two-phase float addition can
  * differ from single-phase in the last ulp, and graft treats plan rewrites
  * that can change any emitted bit as unsound. `first/last/collect_*` are
  * order- or multiplicity-sensitive; `avg` and distinct aggregates are not
  * decomposed. `grouping()`/`grouping_id()` read the gid column and pass
  * through untouched.
  *
  * Cardinality evidence: every grouping key must trace (through the alias
  * Project the analyzer inserts, then filters/projections) to a base-scan
  * column with a declared NDV bound, and the product of the bounds must not
  * exceed [[PreAggregateGroupingSets.MaxFinestGroups]]. Filters only shrink
  * a domain, so the declared bound stays an upper bound under any pushed
  * predicate. No declaration → no rewrite (the pre-aggregate is a pure
  * pessimization when the finest grain is near-unique).
  *
  * Scale: the pre-aggregate partial-aggregates map-side exactly like the
  * original plan's first phase, so the exchange carries ≤ NDV-product rows
  * per partition instead of set-count × input rows; the grouping-set
  * replication then costs set-count × NDV-product rows total — constant,
  * data-size-independent work.
  */
object PreAggregateGroupingSets extends Rule[LogicalPlan] {

  /** Declared-NDV-product ceiling for the finest grain. Above this the
    * intermediate stops being "tiny" and the extra aggregate's hash state
    * could rival the Expand cost it removes. */
  val MaxFinestGroups: Long = 65536L

  /** Minimum Expand-input size (logical stats) for the rewrite to pay: the
    * pre-aggregate adds one exchange + stage — a fixed scheduling quantum —
    * while the saving grows with input bytes × (set count − 1). Measured at
    * the boundary (BASELINE.md round 18): q_agg_rollup sf0.1 (~30 MB after
    * pruning) REGRESSED 0.5 → 1.05 s under the rewrite, sf10 (~300 MB) won
    * mildly (2.1 → 1.9 s), sf100 halved (14.3 → 6.2 s). One default split
    * (128 MB) is the natural floor: input that fits a single scan task
    * cannot amortize a second stage. Overridable per session for tests and
    * unusual cost environments. */
  val MinInputBytesKey = "spark.graft.preAggGroupingSets.minInputBytes"
  val MinInputBytesDefault: Long = 128L << 20

  private val GidName = "spark_grouping_id"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(_, _, expand: Expand, _) =>
      eligible(agg, expand).map(rewrite(agg, expand, _)).getOrElse(agg)
  }

  /** Parsed grouping-sets Expand: which output positions pass input columns
    * through, which carry (null-maskable) grouping keys (with the child
    * attribute each masks — projections reference CHILD attrs while the
    * Expand output mints fresh ones), and the gid. */
  private final case class Shape(
      passthroughPos: Seq[Int],
      groupPos: Seq[Int],
      groupSource: Map[Int, Attribute],
      gidPos: Int,
      reAggs: Map[AggregateExpression, ReAgg])

  /** One aggregate's decomposition: the pre-aggregate output and a builder
    * for the final re-aggregation over that output's attribute. */
  private final case class ReAgg(partial: NamedExpression,
                                 rebuild: Attribute => Expression)

  private def eligible(agg: Aggregate, expand: Expand): Option[Shape] = {
    val output = expand.output
    if (output.isEmpty || expand.projections.isEmpty) return None
    // don't re-fire on our own rewrite (or any already-aggregated input)
    if (expand.child.isInstanceOf[Aggregate]) return None
    // too small to amortize the extra stage (see MinInputBytesKey)
    val minBytes = try conf.getConfString(MinInputBytesKey,
      MinInputBytesDefault.toString).toLong
    catch { case _: NumberFormatException => MinInputBytesDefault }
    if (expand.child.stats.sizeInBytes < minBytes) return None

    val gidPos = output.size - 1
    val gid = output(gidPos)
    if (gid.name != GidName) return None

    // the final aggregate must group by exactly (some output attrs) + gid
    val groupAttrs = groupingExprs(agg) match {
      case Some(attrs) if attrs.exists(_.exprId == gid.exprId) =>
        attrs.filterNot(_.exprId == gid.exprId)
      case _ => return None
    }
    val groupPosByAttr = groupAttrs.flatMap { a =>
      val p = output.indexWhere(_.exprId == a.exprId)
      if (p < 0 || p == gidPos) return None
      Some(p)
    }
    val groupPosSet = groupPosByAttr.toSet
    if (groupPosSet.size != groupAttrs.size) return None
    val passthroughPos = output.indices
      .filterNot(p => p == gidPos || groupPosSet.contains(p))

    // every projection: identical attrs at passthrough positions, attr-or-
    // null at group positions (one consistent child attr per position), a
    // literal at the gid position
    val groupSource = scala.collection.mutable.Map.empty[Int, Attribute]
    val wellFormed = expand.projections.forall { proj =>
      proj.size == output.size &&
        passthroughPos.forall { p => proj(p) match {
          case a: Attribute => a.exprId == output(p).exprId
          case _            => false
        }} &&
        groupPosSet.forall { p => proj(p) match {
          case a: Attribute =>
            groupSource.getOrElseUpdate(p, a).exprId == a.exprId
          case l: Literal   => l.value == null
          case _            => false
        }} &&
        proj(gidPos).isInstanceOf[Literal]
    }
    if (!wellFormed) return None
    // a key masked to null in EVERY set has no source to pre-group on
    if (groupSource.size != groupPosSet.size) return None

    // every aggregate must be re-aggregable and read only passthrough cols
    val passSet = AttributeSet(passthroughPos.map(output))
    val aggExpressions = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (aggExpressions.isEmpty) return None
    val reAggs = scala.collection.mutable.Map.empty[AggregateExpression, ReAgg]
    aggExpressions.foreach { ae =>
      if (!reAggs.contains(ae)) {
        if (ae.isDistinct || ae.filter.isDefined) return None
        if (!ae.references.subsetOf(passSet)) return None
        reAggs += ae -> (decompose(ae).getOrElse(return None))
      }
    }

    // cardinality evidence: declared NDV bound per key, bounded product
    // (BigInt: declared bounds are caller input, the product must not wrap)
    val ndvs = groupSource.values.toSeq
      .map(a => declaredNdv(a, expand.child).getOrElse(return None))
    if (ndvs.exists(_ <= 0) ||
        ndvs.map(BigInt(_)).product > BigInt(MaxFinestGroups)) return None

    Some(Shape(passthroughPos, groupPosByAttr, groupSource.toMap, gidPos, reAggs.toMap))
  }

  /** The final aggregate's grouping expressions as attributes (None when any
    * is a computed expression — the analyzer's lowering only emits attrs). */
  private def groupingExprs(agg: Aggregate): Option[Seq[Attribute]] = {
    val attrs = agg.groupingExpressions.map {
      case a: Attribute => a
      case _            => return None
    }
    Some(attrs)
  }

  /** Exact decomposition of one aggregate function, or None if the function
    * cannot be re-aggregated without changing any output bit. */
  private def decompose(ae: AggregateExpression): Option[ReAgg] = ae.aggregateFunction match {
    case _: Count =>
      val partial = Alias(ae, "pre_count")()
      Some(ReAgg(partial, a => Coalesce(Seq(
        AggregateExpression(Sum(a), ae.mode, isDistinct = false), Literal(0L)))))
    case Sum(child, _) => child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val partial = Alias(ae, "pre_sum")()
        Some(ReAgg(partial, a => AggregateExpression(Sum(a), ae.mode, isDistinct = false)))
      case _: DecimalType =>
        val partial = Alias(ae, "pre_sum")()
        // re-summing widens the decimal; cast back to the original result
        // type (values that fit the original sum fit its type by definition)
        Some(ReAgg(partial, a => Cast(
          AggregateExpression(Sum(a), ae.mode, isDistinct = false), ae.dataType)))
      case _ => None // double/float: two-phase addition is not bit-stable
    }
    case _: Min =>
      val partial = Alias(ae, "pre_min")()
      Some(ReAgg(partial, a => AggregateExpression(Min(a), ae.mode, isDistinct = false)))
    case _: Max =>
      val partial = Alias(ae, "pre_max")()
      Some(ReAgg(partial, a => AggregateExpression(Max(a), ae.mode, isDistinct = false)))
    case Decimal128Sum(child, scale) =>
      val partial = Alias(AggregateExpression(
        Decimal128SumPartial(child, scale), ae.mode, isDistinct = false), "pre_sum128")()
      Some(ReAgg(partial, a => AggregateExpression(
        Decimal128SumMerge(a, scale), ae.mode, isDistinct = false)))
    case _ => None
  }

  /** Declared NDV upper bound for a grouping key's source attribute:
    * resolve through projections (de-aliasing injective casts), filters and
    * hints to the base scan column, then look the bound up in the RELY
    * registry. Filters only shrink a domain, so a pushed predicate below
    * the rollup leaves the declared bound valid. */
  @annotation.tailrec
  private def declaredNdv(attr: Attribute, plan: LogicalPlan): Option[Long] = plan match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      for {
        scanAttr <- lr.output.find(_.exprId == attr.exprId)
        tag <- Constraints.scanTag(lr)
        tc <- Constraints.get(tag)
        bound <- tc.ndv.get(scanAttr.name)
      } yield bound
    case Project(projectList, child) =>
      projectList.find(_.exprId == attr.exprId) match {
        case Some(al: Alias) => RiRules.stripCast(al.child) match {
          case a: Attribute => declaredNdv(a, child)
          case _            => None
        }
        case Some(a: Attribute) => declaredNdv(a, child)
        case _                  => None
      }
    case Filter(_, child)       => declaredNdv(attr, child)
    case ResolvedHint(child, _) => declaredNdv(attr, child)
    case _ => None
  }

  private def rewrite(agg: Aggregate, expand: Expand, shape: Shape): LogicalPlan = {
    val output = expand.output
    val gid = output(shape.gidPos)

    // pre-aggregate the Expand's input at the finest grain: group on the
    // child-side source attrs the projections mask (and output them, so the
    // copied-verbatim projections still resolve)
    val sourceAttrs = shape.groupPos.flatMap(shape.groupSource.get).distinct
    val reAggList = shape.reAggs.toSeq
    val pre = Aggregate(
      sourceAttrs,
      sourceAttrs ++ reAggList.map(_._2.partial),
      expand.child)
    val partialAttrByAe: Map[AggregateExpression, Attribute] =
      reAggList.map { case (ae, r) => ae -> r.partial.toAttribute }.toMap

    // rebuilt Expand: partial columns pass through, group keys mask exactly
    // as before (the per-set attr-or-null pattern is copied verbatim)
    val pAttrs = reAggList.map(_._2.partial.toAttribute)
    val newOutput = pAttrs ++ shape.groupPos.map(output) :+ gid
    val newProjections = expand.projections.map { proj =>
      (pAttrs: Seq[Expression]) ++
        shape.groupPos.map(p => proj(p)) :+ proj(shape.gidPos)
    }
    val newExpand = Expand(newProjections, newOutput, pre)

    // final aggregate: same grouping, aggregates re-aggregate the partials
    val newAggExprs = agg.aggregateExpressions.map(_.transform {
      case ae: AggregateExpression if shape.reAggs.contains(ae) =>
        shape.reAggs(ae).rebuild(partialAttrByAe(ae))
    }.asInstanceOf[NamedExpression])
    Aggregate(agg.groupingExpressions, newAggExprs, newExpand)
  }
}
