package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Marker node carrying a per-join bin width from the `RANGE_BIN(w)`
  * hint through analysis to [[RangeJoinBinning]], which rewrites the
  * joins underneath and strips it. Pass-through output, so it is
  * plan-transparent apart from briefly fencing pushdown above it —
  * the hint belongs directly on the join result, where nothing needs
  * to push through. */
case class RangeBinHint(width: Double, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): RangeBinHint = copy(child = newChild)
}

/** Analyzer-side resolution for `df.hint("range_bin", w)` /
  * `/*+ RANGE_BIN(w) */`: swaps the UnresolvedHint for the typed
  * marker before Spark's unknown-hint sweep would drop it. */
case class ResolveRangeBinHint() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case UnresolvedHint(name, params, child)
          if name.equalsIgnoreCase("RANGE_BIN") =>
        val w = params match {
          case Seq(Literal(v, _)) => numeric(v)
          case Seq(v) => numeric(v)
          case _ => None
        }
        w.filter(x => x > 0 && !x.isNaN && !x.isInfinite) match {
          case Some(width) => RangeBinHint(width, child)
          case None =>
            logWarning(s"RANGE_BIN hint needs one positive numeric " +
              s"width parameter, got $params — ignored")
            child
        }
    }

  private def numeric(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case s: Short => Some(s.toDouble)
    case d: java.math.BigDecimal => Some(d.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }
}

/** Binned range-join rewrite — the missing OSS-Spark optimization for
  * pure inequality joins (`point BETWEEN lo AND hi` with no equi keys),
  * which the planner otherwise executes as BroadcastNestedLoopJoin:
  * O(|L|·|R|) compares, a scale killer once neither side broadcasts.
  *
  * With `spark.graft.rangeJoin.binWidth` set to W > 0 (choose W ≈ the
  * typical interval length, the same contract as the bin-size session
  * conf in commercial Spark range-join support), an eligible join
  *
  * {{{ A JOIN B ON b.lo <= a.pt AND a.pt <= b.hi }}}
  *
  * becomes an EQUI-join on the bin number floor(x / W): the interval
  * side explodes one row per covered bin (sequence(floor(lo/W),
  * floor(hi/W))), the point side computes its single bin, and the
  * original predicates ride along as the post-join filter. Each
  * matching pair meets in exactly one bin (the point's), so no
  * dedup is needed; coverage follows from floor monotonicity. The
  * result is a ShuffledHashJoin/SortMergeJoin that partitions both
  * sides by bin — linear shuffle, per-bucket compare — instead of the
  * all-pairs loop.
  *
  * Eligibility (conservative by design):
  *  - INNER join whose condition has NO cross-side equality conjunct
  *    (if one exists the planner already hash-joins on it, and the
  *    guard also makes the rewrite idempotent — the rewritten join
  *    carries a bin equality);
  *  - two inequality conjuncts bounding one side's numeric expression
  *    between two expressions of the other side, all deterministic.
  *
  * Null/empty semantics match the original inner join: a NULL bound or
  * point yields no sequence row / no bin match, exactly where the
  * original predicate evaluated to NULL; lo > hi rows are filtered on
  * the interval side (they can match nothing).
  */
case class RangeJoinBinning() extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // per-join widths from RANGE_BIN hints first (marker stripped
    // either way), then the session-wide conf as the blanket setting
    val hinted = plan.transformUp {
      case RangeBinHint(w, child) => child.transformUp {
        case j @ Join(_, _, Inner, Some(cond), _) =>
          rewrite(j, cond, w).getOrElse(j)
      }
    }
    val w = try {
      conf.getConfString("spark.graft.rangeJoin.binWidth", "0").toDouble
    } catch { case _: NumberFormatException => 0.0 }
    if (w <= 0 || w.isNaN || w.isInfinite) hinted
    else hinted.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, w).getOrElse(j)
    }
  }

  /** a <= b (or <) pairs from one inequality conjunct. */
  private def asBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def rewrite(j: Join, cond: Expression,
      w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val spansBoth = (e: Expression) =>
      e.references.intersect(j.left.outputSet).nonEmpty &&
        e.references.intersect(j.right.outputSet).nonEmpty
    val hasEqui = conjuncts.exists {
      case e @ (EqualTo(_, _) | EqualNullSafe(_, _)) => spansBoth(e)
      case _ => false
    }
    if (hasEqui) return None

    val bounds = conjuncts.flatMap(c => asBound(c).map(b => (c, b)))
    // find (lo <= pt, pt <= hi) with pt from one side, lo/hi from the other
    val hit = bounds.iterator.flatMap { case (_, (lo, pt1)) =>
      bounds.iterator.collect {
        case (_, (pt2, hi)) if pt1.semanticEquals(pt2) &&
            pt1.deterministic && lo.deterministic && hi.deterministic &&
            numeric(pt1) && numeric(lo) && numeric(hi) =>
          (lo, pt1, hi)
      }
    }.collectFirst {
      case (lo, pt, hi)
          if sideOf(j, pt).nonEmpty && sideOf(j, lo).nonEmpty &&
            sideOf(j, lo) == sideOf(j, hi) &&
            sideOf(j, lo) != sideOf(j, pt) =>
        (lo, pt, hi)
    }
    hit.map { case (lo, pt, hi) =>
      def bin(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(w)))
      val intervalOnLeft = sideOf(j, lo).contains("l")
      val (intervalChild, pointChild) =
        if (intervalOnLeft) (j.left, j.right) else (j.right, j.left)
      // interval side: drop empty intervals, explode covered bins
      val binAttr = AttributeReference("graft_bin", LongType)()
      // a width far below the interval span would explode one row per
      // covered bin without bound (per-row OOM / Sequence's
      // MAX_ROUNDED_ARRAY_LENGTH) — cap bins-per-interval and turn the
      // overrun into an ACTIONABLE error instead of a silent blowup;
      // the And/Or operands below are ordered so the raise is reached
      // only by a non-null in-order interval that exceeds the cap
      val cap = try {
        conf.getConfString("spark.graft.rangeJoin.maxBinsPerRow", "8192")
          .toLong
      } catch { case _: NumberFormatException => 8192L }
      // covered bins = bin(hi) - bin(lo) + 1, so "≤ cap bins" is a
      // STRICT compare on the difference (diff < cap); <= would let
      // cap+1 bins through while the error text promises cap
      val binsOk = LessThan(Subtract(bin(hi), bin(lo)),
        Literal(math.max(cap, 1L)))
      // RaiseError behind Or relies on Or's left-to-right short
      // circuit surviving later optimizer batches — the same contract
      // Spark's own assert_true lowering (RaiseError behind If/Or)
      // depends on, so a rule reordering that broke this would break
      // assert_true first
      val capGuard = Or(binsOk, IsNull(new RaiseError(Literal(
        s"graft range-join binning: an interval spans more than " +
          s"${math.max(cap, 1L)} bins at width $w — raise " +
          "spark.graft.rangeJoin.binWidth or " +
          "spark.graft.rangeJoin.maxBinsPerRow"))))
      val intervalFilter = And(And(IsNotNull(lo), IsNotNull(hi)),
        And(LessThanOrEqual(lo, hi), capGuard))
      // timeZoneId must be filled by hand: Sequence is time-zone aware
      // and the analyzer's ResolveTimeZone already ran
      val gen = Generate(
        Explode(Sequence(bin(lo), bin(hi), Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr),
        child = Filter(intervalFilter, intervalChild))
      // point side: the single bin the point lands in
      val ptAlias = Alias(bin(pt), "graft_bin")()
      val proj = Project(pointChild.output :+ ptAlias, pointChild)
      val (newLeft, newRight) =
        if (intervalOnLeft) (gen, proj) else (proj, gen)
      val newCond = And(EqualTo(binAttr, ptAlias.toAttribute), cond)
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }

  /** Which join side an expression's references live on entirely. */
  private def sideOf(j: Join, e: Expression): Option[String] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(j.left.outputSet)) Some("l")
    else if (refs.subsetOf(j.right.outputSet)) Some("r")
    else None
  }
}
