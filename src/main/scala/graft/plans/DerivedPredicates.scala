package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate-derivation optimizer rules the engine registers globally via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`, so they join
  * the operator-optimization fixed point and Catalyst's own pushdown rules
  * carry what they derive all the way to the parquet scans).
  *
  * Both rules close constraint-propagation gaps that the r15 sf100 (1000×)
  * sweep measured as the dominant last-decade terms — previously patched by
  * hand-written filters inside the affected queries (q4/q7), now derived by
  * the ENGINE from the naive declarative form:
  *
  *  - [[DeriveNonEquiJoinBounds]]: `x > y ∧ y ≥ c ⟹ x > c` across a
  *    non-equi join predicate. Catalyst's `InferFiltersFromConstraints`
  *    only propagates along equalities, so a literal bound on one side of
  *    an inequality never reaches the other side's scan. Measured (q4,
  *    sf100): the derived `l_shipdate > 2000-01-01` bound thins the 600M-row
  *    semi-join probe ~3.7× — 189 s → 7.7 s isolated.
  *  - [[DeriveDisjunctiveDomains]]: `(a=v₁ ∧ b=w₁) ∨ (a=v₂ ∧ b=w₂) ⟹
  *    a ∈ {v₁,v₂} ∧ b ∈ {w₁,w₂}`. Catalyst intersects the CONSTRAINT SETS
  *    of Or branches (empty here — the branches contradict each other), so
  *    it derives nothing; the per-attribute domain union is sound and each
  *    derived IN is single-sided, so pushdown carries it through the joins
  *    to the scans. Measured (q7, sf100): nation-pair domains thin supplier
  *    and customer 2/25 before the fact shuffles — 125 s → 10.6 s isolated.
  *
  * Soundness notes shared by both rules (also the convergence argument —
  * these run inside a fixed-point batch, so every addition must become
  * visible to the next iteration's implied-check):
  *
  *  - Null semantics: a derived predicate evaluates null/false only on rows
  *    where the ORIGINAL predicate already evaluated null/false (a null
  *    `a` nulls every Or branch; a null `x` nulls `x > y`), and
  *    Filter/Inner/Semi/Cross all drop non-true rows — so adding the
  *    derived conjunct never changes results. Outer/anti joins are
  *    excluded: there non-true rows SURVIVE (null-padded / kept), so
  *    pre-filtering a side is not generally sound.
  *  - Idempotence: a derived predicate is only added when it is not already
  *    known — present in the target side's `constraints` (which include
  *    every Filter below, i.e. the very filter the previous iteration
  *    added, even after pushdown relocates it) or among the condition's
  *    own conjuncts. Constraint propagation off ⟹ rules disabled (the
  *    implied-check would be blind and the batch would not converge).
  */
private[plans] trait DerivedPredicateHelper extends PredicateHelper {
  /** Non-null literal bound predicates over `a` found in `known`, as
    * (isLower, isStrict, literal). The bound may sit behind an
    * order-preserving injective cast of `a` (the analyzer's type-coercion
    * wrapper — dates compared as timestamps are the common case): for an
    * up-cast `f`, `f(a) cmp c ⟺ a cmp f⁻¹(c)` whenever `c` round-trips
    * through the cast exactly, so the bound is inverted into `a`'s own
    * type (see [[invertUpCast]]). An equality `a = c` contributes both a
    * non-strict lower and upper bound.
    */
  protected def literalBounds(known: ExpressionSet, a: Attribute): Seq[(Boolean, Boolean, Literal)] =
    known.toSeq.flatMap {
      case GreaterThanOrEqual(x, l: Literal) => boundOn(x, a, isLower = true, strict = false, l)
      case GreaterThan(x, l: Literal) => boundOn(x, a, isLower = true, strict = true, l)
      case LessThanOrEqual(l: Literal, x) => boundOn(x, a, isLower = true, strict = false, l)
      case LessThan(l: Literal, x) => boundOn(x, a, isLower = true, strict = true, l)
      case LessThanOrEqual(x, l: Literal) => boundOn(x, a, isLower = false, strict = false, l)
      case LessThan(x, l: Literal) => boundOn(x, a, isLower = false, strict = true, l)
      case GreaterThanOrEqual(l: Literal, x) => boundOn(x, a, isLower = false, strict = false, l)
      case GreaterThan(l: Literal, x) => boundOn(x, a, isLower = false, strict = true, l)
      case EqualTo(x, l: Literal) =>
        boundOn(x, a, isLower = true, strict = false, l) ++
          boundOn(x, a, isLower = false, strict = false, l)
      case EqualTo(l: Literal, x) =>
        boundOn(x, a, isLower = true, strict = false, l) ++
          boundOn(x, a, isLower = false, strict = false, l)
      case _ => Nil
    }

  private def boundOn(x: Expression, a: Attribute, isLower: Boolean, strict: Boolean,
      l: Literal): Seq[(Boolean, Boolean, Literal)] = {
    if (l.value == null) return Nil
    x match {
      case attr: Attribute if attr.semanticEquals(a) => Seq((isLower, strict, l))
      case c @ Cast(attr: Attribute, dt, _, _)
          if attr.semanticEquals(a) && Cast.canUpCast(attr.dataType, dt) =>
        invertUpCast(l, attr.dataType, dt, c.timeZoneId)
          .map((isLower, strict, _)).toSeq
      case _ => Nil
    }
  }

  /** Inverts a bound stated on an up-cast: up-casts are injective and
    * order-preserving, so on image points `f(a) cmp c ⟺ a cmp f⁻¹(c)` with
    * identical strictness. `f⁻¹(c)` exists exactly when the down-cast
    * round-trips back to `c`; off-image literals (a timestamp that is not
    * midnight, a long beyond int range) yield None — the derivation is
    * simply not made, which is sound. TRY eval mode so overflow is a null,
    * never a throw, inside an optimizer rule.
    */
  protected def invertUpCast(l: Literal, from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType, tz: Option[String]): Option[Literal] = {
    val down = Cast(l, from, tz, EvalMode.TRY)
    if (!down.resolved) return None
    val downV = down.eval(null)
    if (downV == null) return None
    val inverted = Literal.create(downV, from)
    val up = Cast(inverted, to, tz, EvalMode.TRY)
    if (!up.resolved) return None
    val roundTrip = up.eval(null)
    if (roundTrip != null && Literal.create(roundTrip, to).semanticEquals(l)) Some(inverted)
    else None
  }

  /** Lifts a literal bound on `a` into the comparison domain of an up-cast
    * endpoint: `a ≥ c ⟹ f(a) ≥ f(c)` (monotone), and up-casts never
    * overflow so the eval always succeeds.
    */
  protected def liftUpCast(l: Literal, cast: Option[Cast]): Option[Literal] = cast match {
    case None => Some(l)
    case Some(c) =>
      val up = Cast(l, c.dataType, c.timeZoneId, EvalMode.TRY)
      if (!up.resolved) None
      else Option(up.eval(null)).map(Literal.create(_, c.dataType))
  }

  /** Unwraps a comparison endpoint to its underlying attribute: a bare
    * attribute, or an order-preserving injective (up-)cast of one.
    */
  protected def endpoint(e: Expression): Option[(Attribute, Option[Cast])] = e match {
    case a: Attribute => Some((a, None))
    case c @ Cast(a: Attribute, dt, _, _) if Cast.canUpCast(a.dataType, dt) =>
      Some((a, Some(c)))
    case _ => None
  }
}

/** Derives literal bounds across non-equi join predicates (see file
  * scaladoc). For each inequality conjunct `x <cmp> y` joining opposite
  * sides: a LOWER bound on the lesser side transfers to the greater side,
  * and an UPPER bound on the greater side transfers to the lesser side —
  * strict if either the comparison or the source bound is strict. The
  * derived bound lands as a Filter on the receiving side, where Catalyst's
  * pushdown takes it to the scan.
  */
object DeriveNonEquiJoinBounds extends Rule[LogicalPlan] with DerivedPredicateHelper {

  /** Cheap syntactic gate: computing `constraints` is the expensive part
    * (it walks the whole subtree), so no join without an inequality
    * conjunct between attribute endpoints (bare or up-cast-wrapped — the
    * analyzer coerces a date-vs-timestamp comparison by casting the date
    * side up) may pay for it.
    */
  private def hasInequalityConjunct(cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case GreaterThan(a, b) => endpoint(a).isDefined && endpoint(b).isDefined
      case GreaterThanOrEqual(a, b) => endpoint(a).isDefined && endpoint(b).isDefined
      case LessThan(a, b) => endpoint(a).isDefined && endpoint(b).isDefined
      case LessThanOrEqual(a, b) => endpoint(a).isDefined && endpoint(b).isDefined
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.constraintPropagationEnabled) return plan
    plan.transform {
      case j @ Join(left, right, jt, Some(cond), _)
          if (jt == Inner || jt == LeftSemi || jt == Cross) &&
            hasInequalityConjunct(cond) && cond.deterministic =>
        val (leftAdd, rightAdd) = derive(left, right, cond)
        if (leftAdd.isEmpty && rightAdd.isEmpty) j
        else j.copy(
          left = leftAdd.reduceOption(And).map(Filter(_, left)).getOrElse(left),
          right = rightAdd.reduceOption(And).map(Filter(_, right)).getOrElse(right))
    }
  }

  /** (greater, lesser, strict) normal form of an inequality conjunct whose
    * operands are attribute endpoints (bare or up-cast) from opposite
    * sides.
    */
  private type Endpoint = (Attribute, Option[Cast])
  private def ordered(e: Expression, leftOut: AttributeSet, rightOut: AttributeSet)
      : Option[(Endpoint, Endpoint, Boolean)] = {
    def mk(g: Expression, l: Expression, strict: Boolean): Option[(Endpoint, Endpoint, Boolean)] =
      for {
        ge <- endpoint(g)
        le <- endpoint(l)
        if opposite(ge._1, le._1, leftOut, rightOut)
      } yield (ge, le, strict)
    e match {
      case GreaterThan(a, b) => mk(a, b, strict = true)
      case GreaterThanOrEqual(a, b) => mk(a, b, strict = false)
      case LessThan(a, b) => mk(b, a, strict = true)
      case LessThanOrEqual(a, b) => mk(b, a, strict = false)
      case _ => None
    }
  }

  private def opposite(a: Attribute, b: Attribute,
      leftOut: AttributeSet, rightOut: AttributeSet): Boolean =
    (leftOut.contains(a) && rightOut.contains(b)) ||
      (rightOut.contains(a) && leftOut.contains(b))

  private def derive(left: LogicalPlan, right: LogicalPlan, cond: Expression)
      : (Seq[Expression], Seq[Expression]) = {
    val leftOut = left.outputSet
    val rightOut = right.outputSet
    var leftAdd = ExpressionSet()
    var rightAdd = ExpressionSet()

    def planOf(a: Attribute): LogicalPlan = if (leftOut.contains(a)) left else right
    def add(target: Attribute, derived: Expression): Unit = {
      // skip what the receiving side already knows (incl. the filter a
      // previous fixed-point iteration added — the convergence guarantee)
      if (!planOf(target).constraints.contains(derived)) {
        if (leftOut.contains(target)) leftAdd += derived else rightAdd += derived
      }
    }
    // A bound travels source-attr → (lift through the source's cast into
    // the comparison domain) → (invert through the target's cast back into
    // the target attr's own type). Both hops are identity for bare attrs;
    // an off-image literal at the invert hop just skips the derivation.
    def transfer(src: Endpoint, lit: Literal, tgt: Endpoint): Option[Literal] =
      liftUpCast(lit, src._2).flatMap { inCmp =>
        tgt._2 match {
          case None => Some(inCmp)
          case Some(c) => invertUpCast(inCmp, tgt._1.dataType, c.dataType, c.timeZoneId)
        }
      }

    splitConjunctivePredicates(cond).flatMap(ordered(_, leftOut, rightOut)).foreach {
      case (greater, lesser, strictCmp) =>
        // lesser ≥/> c  ⟹  greater > c (≥ only if both non-strict)
        literalBounds(planOf(lesser._1).constraints, lesser._1).foreach {
          case (true, strictBound, lit) =>
            transfer(lesser, lit, greater).foreach { t =>
              add(greater._1,
                if (strictCmp || strictBound) GreaterThan(greater._1, t)
                else GreaterThanOrEqual(greater._1, t))
            }
          case _ => ()
        }
        // greater ≤/< c  ⟹  lesser < c (≤ only if both non-strict)
        literalBounds(planOf(greater._1).constraints, greater._1).foreach {
          case (false, strictBound, lit) =>
            transfer(greater, lit, lesser).foreach { t =>
              add(lesser._1,
                if (strictCmp || strictBound) LessThan(lesser._1, t)
                else LessThanOrEqual(lesser._1, t))
            }
          case _ => ()
        }
    }
    (leftAdd.toSeq, rightAdd.toSeq)
  }
}

/** Derives per-attribute literal facts from disjunctions (see file
  * scaladoc), applied to Filter conditions and to Inner/Semi/Cross join
  * conditions (Catalyst's own pushdown may have moved the user's WHERE
  * disjunction into the join before this rule sees it):
  *
  *  - exact domain — EVERY branch pins `a` to literals (via `=`/`IN`) ⟹
  *    `a IN (union of the branch literals)`;
  *  - range envelope — EVERY branch bounds `a` from below (above) via
  *    `=`/`IN`/`>`/`≥` (`<`/`≤`) literals ⟹ `a ≥ min` (`a ≤ max`) of the
  *    per-branch tightest bounds. The TPC-H Q19 shape: three brand
  *    branches each with `l_quantity BETWEEN lo_i AND hi_i` imply
  *    `l_quantity BETWEEN min(lo) AND max(hi)` on the FACT side of the
  *    join — the one derived predicate there that thins a 100 TB scan.
  */
object DeriveDisjunctiveDomains extends Rule[LogicalPlan] with DerivedPredicateHelper {

  private val MaxBranches = 32

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.constraintPropagationEnabled) return plan
    plan.transform {
      case f @ Filter(cond, child) if cond.deterministic =>
        // domains first (cheap, syntactic), then the condition's own
        // conjuncts (cheap), and only for survivors the child constraints
        // — the expensive subtree walk
        val fromCond = deriveAll(cond)
          .filterNot(ExpressionSet(splitConjunctivePredicates(cond)).contains)
        val derived =
          if (fromCond.isEmpty) fromCond
          else fromCond.filterNot(child.constraints.contains)
        if (derived.isEmpty) f else Filter(And(derived.reduce(And), cond), child)
      case j @ Join(left, right, jt, Some(cond), _)
          if (jt == Inner || jt == LeftSemi || jt == Cross) && cond.deterministic =>
        val fromCond = deriveAll(cond)
          .filterNot(ExpressionSet(splitConjunctivePredicates(cond)).contains)
        val derived =
          if (fromCond.isEmpty) fromCond
          else fromCond.filterNot((left.constraints ++ right.constraints).contains)
        if (derived.isEmpty) j
        else j.copy(condition = Some(And(derived.reduce(And), cond)))
    }
  }

  private def deriveAll(cond: Expression): Seq[Expression] =
    splitConjunctivePredicates(cond)
      .collect { case or: Or => domains(or) }
      .flatten

  /** What one branch knows about one attribute. `exact` is the literal set
    * the branch pins it to (None = not pinned); lower/upper are the branch's
    * tightest literal bounds, (value, isStrict).
    */
  private case class BranchFact(attr: Attribute,
      exact: Option[Seq[Literal]],
      lower: Option[(Literal, Boolean)],
      upper: Option[(Literal, Boolean)])

  private def ordering(attr: Attribute): Option[Ordering[Any]] = attr.dataType match {
    case dt if RowOrdering.isOrderable(dt) =>
      Some(org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt))
    case _ => None
  }

  private def domains(or: Or): Seq[Expression] = {
    val branches = splitDisjunctivePredicates(or)
    if (branches.size > MaxBranches) return Nil
    val branchMaps = branches.map(branchFacts)
    if (branchMaps.exists(_.isEmpty)) return Nil
    val common = branchMaps.map(_.keySet).reduce(_ intersect _)
    common.toSeq.sortBy(_.id).flatMap { key =>
      val facts = branchMaps.map(_(key))
      val attr = facts.head.attr
      exactDomain(attr, facts).map(Seq(_)).getOrElse(envelope(attr, facts))
    }
  }

  /** `a IN (∪ branch literals)` when every branch pins `a`. Capped at the
    * OptimizeIn InSet threshold: a larger derived IN would be rewritten to
    * InSet, which the next iteration's implied-check could not recognize —
    * the fixed point would churn. (The envelope below still fires.)
    */
  private def exactDomain(attr: Attribute, facts: Seq[BranchFact]): Option[Expression] = {
    if (!facts.forall(_.exact.isDefined)) return None
    val lits = facts.flatMap(_.exact.get).foldLeft(Seq.empty[Literal]) {
      (acc, l) => if (acc.exists(_.semanticEquals(l))) acc else acc :+ l
    }
    if (lits.isEmpty || lits.size >= conf.optimizerInSetConversionThreshold) None
    else if (lits.size == 1) Some(EqualTo(attr, lits.head))
    else Some(In(attr, lits))
  }

  /** Range envelope: a lower (upper) bound exists when EVERY branch bounds
    * the attribute from that side; the envelope is the loosest per-branch
    * tightest bound — strict only if every branch achieving the extreme is
    * strict.
    */
  private def envelope(attr: Attribute, facts: Seq[BranchFact]): Seq[Expression] =
    ordering(attr).toSeq.flatMap { ord =>
      def extreme(side: BranchFact => Option[(Literal, Boolean)], takeMin: Boolean)
          : Option[(Literal, Boolean)] = {
        val bounds = facts.map(side)
        if (bounds.exists(_.isEmpty)) None
        else Some(bounds.flatten.reduce { (x, y) =>
          val c = ord.compare(x._1.value, y._1.value)
          if (c == 0) (x._1, x._2 && y._2)
          else if ((c < 0) == takeMin) x else y
        })
      }
      val lo = extreme(_.lower, takeMin = true).map { case (l, strict) =>
        if (strict) GreaterThan(attr, l) else GreaterThanOrEqual(attr, l)
      }
      val hi = extreme(_.upper, takeMin = false).map { case (l, strict) =>
        if (strict) LessThan(attr, l) else LessThanOrEqual(attr, l)
      }
      lo.toSeq ++ hi.toSeq
    }

  /** Per-attribute facts of one branch; within the branch, exact sets
    * intersect and bounds tighten (the branch implies ALL its conjuncts).
    * An attribute whose intersection empties out is dropped — the branch is
    * unsatisfiable there, and dropping the attribute only weakens the
    * derivation (sound).
    */
  private def branchFacts(branch: Expression): Map[ExprId, BranchFact] = {
    val pins = splitConjunctivePredicates(branch).collect {
      case EqualTo(a: Attribute, l: Literal) if ok(a, l) =>
        BranchFact(a, Some(Seq(l)), Some((l, false)), Some((l, false)))
      case EqualTo(l: Literal, a: Attribute) if ok(a, l) =>
        BranchFact(a, Some(Seq(l)), Some((l, false)), Some((l, false)))
      case EqualNullSafe(a: Attribute, l: Literal) if ok(a, l) =>
        BranchFact(a, Some(Seq(l)), Some((l, false)), Some((l, false)))
      case EqualNullSafe(l: Literal, a: Attribute) if ok(a, l) =>
        BranchFact(a, Some(Seq(l)), Some((l, false)), Some((l, false)))
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall {
            case l: Literal => ok(a, l)
            case _ => false
          } =>
        val ls = vs.map(_.asInstanceOf[Literal])
        val minMax = ordering(a).map { ord =>
          (ls.reduce((x, y) => if (ord.compare(x.value, y.value) <= 0) x else y),
            ls.reduce((x, y) => if (ord.compare(x.value, y.value) >= 0) x else y))
        }
        BranchFact(a, Some(ls), minMax.map(m => (m._1, false)), minMax.map(m => (m._2, false)))
      case GreaterThan(a: Attribute, l: Literal) if ok(a, l) =>
        BranchFact(a, None, Some((l, true)), None)
      case GreaterThanOrEqual(a: Attribute, l: Literal) if ok(a, l) =>
        BranchFact(a, None, Some((l, false)), None)
      case LessThan(a: Attribute, l: Literal) if ok(a, l) =>
        BranchFact(a, None, None, Some((l, true)))
      case LessThanOrEqual(a: Attribute, l: Literal) if ok(a, l) =>
        BranchFact(a, None, None, Some((l, false)))
      case GreaterThan(l: Literal, a: Attribute) if ok(a, l) =>
        BranchFact(a, None, None, Some((l, true)))
      case GreaterThanOrEqual(l: Literal, a: Attribute) if ok(a, l) =>
        BranchFact(a, None, None, Some((l, false)))
      case LessThan(l: Literal, a: Attribute) if ok(a, l) =>
        BranchFact(a, None, Some((l, true)), None)
      case LessThanOrEqual(l: Literal, a: Attribute) if ok(a, l) =>
        BranchFact(a, None, Some((l, false)), None)
    }
    pins.groupBy(_.attr.exprId).flatMap { case (id, group) =>
      val merged = group.reduce(mergeWithin)
      // drop attrs whose exact intersection emptied (unsatisfiable branch)
      if (merged.exact.exists(_.isEmpty)) None else Some(id -> merged)
    }
  }

  private def ok(a: Attribute, l: Literal): Boolean =
    l.value != null && l.dataType == a.dataType

  /** Conjunction of two facts about the same attribute in one branch. */
  private def mergeWithin(x: BranchFact, y: BranchFact): BranchFact = {
    val ord = ordering(x.attr)
    def tighter(a: Option[(Literal, Boolean)], b: Option[(Literal, Boolean)], takeMax: Boolean) =
      (a, b, ord) match {
        case (Some(p), Some(q), Some(o)) =>
          val c = o.compare(p._1.value, q._1.value)
          Some(if (c == 0) (p._1, p._2 || q._2)
          else if ((c > 0) == takeMax) p else q)
        case _ => a.orElse(b)
      }
    val exact = (x.exact, y.exact) match {
      case (Some(xs), Some(ys)) => Some(xs.filter(l => ys.exists(_.semanticEquals(l))))
      case _ => x.exact.orElse(y.exact)
    }
    BranchFact(x.attr, exact,
      tighter(x.lower, y.lower, takeMax = true),
      tighter(x.upper, y.upper, takeMax = false))
  }
}
