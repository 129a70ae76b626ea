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
    * (isLower, isStrict, literal).
    */
  protected def literalBounds(known: ExpressionSet, a: Attribute): Seq[(Boolean, Boolean, Literal)] =
    known.toSeq.collect {
      case GreaterThanOrEqual(x: Attribute, l: Literal) if x.semanticEquals(a) && l.value != null =>
        (true, false, l)
      case GreaterThan(x: Attribute, l: Literal) if x.semanticEquals(a) && l.value != null =>
        (true, true, l)
      case LessThanOrEqual(l: Literal, x: Attribute) if x.semanticEquals(a) && l.value != null =>
        (true, false, l)
      case LessThan(l: Literal, x: Attribute) if x.semanticEquals(a) && l.value != null =>
        (true, true, l)
      case LessThanOrEqual(x: Attribute, l: Literal) if x.semanticEquals(a) && l.value != null =>
        (false, false, l)
      case LessThan(x: Attribute, l: Literal) if x.semanticEquals(a) && l.value != null =>
        (false, true, l)
      case GreaterThanOrEqual(l: Literal, x: Attribute) if x.semanticEquals(a) && l.value != null =>
        (false, false, l)
      case GreaterThan(l: Literal, x: Attribute) if x.semanticEquals(a) && l.value != null =>
        (false, true, l)
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
    * conjunct between bare attributes may pay for it.
    */
  private def hasInequalityConjunct(cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case GreaterThan(_: Attribute, _: Attribute) => true
      case GreaterThanOrEqual(_: Attribute, _: Attribute) => true
      case LessThan(_: Attribute, _: Attribute) => true
      case LessThanOrEqual(_: Attribute, _: Attribute) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.constraintPropagationEnabled) return plan
    plan.transform {
      case j @ Join(left, right, jt, Some(cond), _)
          if (jt == Inner || jt == LeftSemi || jt == Cross) &&
            hasInequalityConjunct(cond) && cond.deterministic =>
        val (leftAdd, rightAdd) = derive(j, left, right, cond)
        if (leftAdd.isEmpty && rightAdd.isEmpty) j
        else j.copy(
          left = leftAdd.reduceOption(And).map(Filter(_, left)).getOrElse(left),
          right = rightAdd.reduceOption(And).map(Filter(_, right)).getOrElse(right))
    }
  }

  /** (greater, lesser, strict) normal form of an inequality conjunct whose
    * operands are bare attributes from opposite sides.
    */
  private def ordered(e: Expression, leftOut: AttributeSet, rightOut: AttributeSet)
      : Option[(Attribute, Attribute, Boolean)] = e match {
    case GreaterThan(a: Attribute, b: Attribute) if opposite(a, b, leftOut, rightOut) =>
      Some((a, b, true))
    case GreaterThanOrEqual(a: Attribute, b: Attribute) if opposite(a, b, leftOut, rightOut) =>
      Some((a, b, false))
    case LessThan(a: Attribute, b: Attribute) if opposite(a, b, leftOut, rightOut) =>
      Some((b, a, true))
    case LessThanOrEqual(a: Attribute, b: Attribute) if opposite(a, b, leftOut, rightOut) =>
      Some((b, a, false))
    case _ => None
  }

  private def opposite(a: Attribute, b: Attribute,
      leftOut: AttributeSet, rightOut: AttributeSet): Boolean =
    (leftOut.contains(a) && rightOut.contains(b)) ||
      (rightOut.contains(a) && leftOut.contains(b))

  private def derive(j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression)
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

    splitConjunctivePredicates(cond).flatMap(ordered(_, leftOut, rightOut)).foreach {
      case (greater, lesser, strictCmp) =>
        // lesser ≥/> c  ⟹  greater > c (≥ only if both non-strict)
        literalBounds(planOf(lesser).constraints, lesser).foreach {
          case (true, strictBound, lit) =>
            add(greater,
              if (strictCmp || strictBound) GreaterThan(greater, lit)
              else GreaterThanOrEqual(greater, lit))
          case _ => ()
        }
        // greater ≤/< c  ⟹  lesser < c (≤ only if both non-strict)
        literalBounds(planOf(greater).constraints, greater).foreach {
          case (false, strictBound, lit) =>
            add(lesser,
              if (strictCmp || strictBound) LessThan(lesser, lit)
              else LessThanOrEqual(lesser, lit))
          case _ => ()
        }
    }
    (leftAdd.toSeq, rightAdd.toSeq)
  }
}

/** Derives per-attribute literal domains from disjunctions (see file
  * scaladoc): when EVERY branch of an Or pins attribute `a` to literals
  * (via `=` or `IN`), the Or implies `a IN (union of the branch literals)`.
  * Applied to Filter conditions and to Inner/Semi/Cross join conditions
  * (Catalyst's own pushdown may have moved the user's WHERE disjunction
  * into the join before this rule sees it).
  */
object DeriveDisjunctiveDomains extends Rule[LogicalPlan] with DerivedPredicateHelper {

  /** Keeps the derived IN broadcast-filter-sized; a 1000-value domain no
    * longer buys scan selectivity worth the expression overhead.
    */
  private val MaxDomainValues = 64
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

  private def domains(or: Or): Seq[Expression] = {
    val branches = splitDisjunctivePredicates(or)
    if (branches.size > MaxBranches) return Nil
    val branchMaps = branches.map(branchEqualities)
    if (branchMaps.exists(_.isEmpty)) return Nil
    val common = branchMaps.map(_.keySet).reduce(_ intersect _)
    common.toSeq.sortBy(_.id).flatMap { key =>
      val attr = branchMaps.flatMap(_.get(key)).head._1
      // union across branches, first-seen order (deterministic: plan order)
      val lits = branchMaps.flatMap(_.get(key).toSeq.flatMap(_._2)).foldLeft(Seq.empty[Literal]) {
        (acc, l) => if (acc.exists(_.semanticEquals(l))) acc else acc :+ l
      }
      if (lits.isEmpty || lits.size > MaxDomainValues) None
      else if (lits.size == 1) Some(EqualTo(attr, lits.head))
      else Some(In(attr, lits))
    }
  }

  /** attribute → literal set the branch pins it to; an attribute equated to
    * two different literal sets in one branch keeps their intersection (the
    * branch implies both).
    */
  private def branchEqualities(branch: Expression)
      : Map[ExprId, (Attribute, Seq[Literal])] = {
    val pins = splitConjunctivePredicates(branch).collect {
      case EqualTo(a: Attribute, l: Literal) if l.value != null => (a, Seq(l))
      case EqualTo(l: Literal, a: Attribute) if l.value != null => (a, Seq(l))
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null => (a, Seq(l))
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null => (a, Seq(l))
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        (a, vs.map(_.asInstanceOf[Literal]))
    }
    pins.groupBy(_._1.exprId).map { case (id, group) =>
      val attr = group.head._1
      val lits = group.map(_._2).reduce { (x, y) =>
        x.filter(l => y.exists(_.semanticEquals(l)))
      }
      id -> (attr, lits)
    }.filter(_._2._2.nonEmpty)
  }
}
