package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a first-class Catalyst operator (SURVEY.md §7.3 path
  * (c): LogicalPlan + Strategy + SparkPlan): for every left row, attach the
  * right row with the same key and the greatest right-time strictly before
  * the left row's time (or nulls). `EventOps.asofPrevClose` expresses the
  * same semantics with built-ins (union + window); this operator exists to
  * exercise the full custom-operator mechanism and to give the semantics a
  * direct physical form: both sides hash-clustered on the key and sorted by
  * (key, time), then a single streaming merge per partition — no state
  * beyond ONE candidate row, no window buffer, no union blow-up.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of merge join. Children are required to be hash-clustered on
  * the key and sorted by (key, time) — Catalyst inserts the exchanges/sorts,
  * and AQE coalesces both sides consistently, so each zipped partition pair
  * holds the same key space.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val schema = left.output ++ right.output
    val rightWidth = right.output.size

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val rBuf = ri.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val resultProj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      var candRow: InternalRow = null
      var candKey: Any = null

      li.map { l =>
        val lk = lkB.eval(l)
        val lt = ltB.eval(l)
        if (lk == null || lt == null) {
          // SQL match semantics: a null key equals nothing and a null time
          // is unordered — the row joins to nulls. No cursor movement: the
          // ascending NULLS FIRST child ordering puts these rows first.
          resultProj(joined(l, nullRight))
        } else {
          // advance the right side through every row strictly before (lk, lt)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rkB.eval(r)
            val rt = if (rk == null) null else rtB.eval(r)
            if (rk == null || rt == null) {
              rBuf.next() // unmatchable under SQL semantics: discard
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0 || (c == 0 && timeOrd.compare(rt, lt) < 0)) {
                val consumed = rBuf.next().copy() // shuffle rows are reused
                candRow = consumed
                candKey = rkB.eval(consumed)
              } else advancing = false
            }
          }
          val matched = candRow != null && keyOrd.compare(candKey, lk) == 0
          resultProj(joined(l, if (matched) candRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoin logical node → AsOfJoinExec. Injectable via
  * `GraftExtensions` or appended to `spark.experimental.extraStrategies` at
  * runtime (what [[AsOfJoin.dataframe]] does).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule for the custom operator: Catalyst's own predicate
  * pushdown knows nothing about [[AsOfJoin]] (an opaque binary node), so
  * without help every `Filter` above it stays above it — the as-of merge
  * processes rows the filter would discard, and nothing reaches the scan's
  * `PushedFilters`. This rule splits a conjunctive filter and pushes the
  * conjuncts that reference only *left-side* attributes into the left
  * child. Left-side pushdown is semantics-preserving because each output
  * row is one left row (plus attached right columns): dropping a left row
  * early drops exactly its output row. Right-side conjuncts are NOT pushed
  * — they reference the *matched* row, and removing a right row before the
  * merge changes which candidate earlier left rows see.
  */
object PushFilterThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  private object Splitter extends PredicateHelper {
    def split(cond: Expression): Seq[Expression] =
      splitConjunctivePredicates(cond)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val leftAttrs = AttributeSet(aj.left.output)
      val (pushable, kept) = Splitter.split(cond)
        .partition(c => c.references.subsetOf(leftAttrs) && c.deterministic)
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(
          left = Filter(pushable.reduce(And), aj.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoin {
  /** DataFrame-level entry: `asofJoin(left, right, leftKey = ..., ...)`.
    * Right-side columns should carry distinct names (alias them) — the
    * output concatenates both schemas. Null handling follows SQL match
    * semantics: a left row with a null key or time joins to nulls; a right
    * row with a null key or time can never be a match and is skipped.
    */
  def dataframe(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    GraftSqlBridge.ofRows(spark,
      AsOfJoin(leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
        GraftSqlBridge.expr(leftKey), GraftSqlBridge.expr(rightKey),
        GraftSqlBridge.expr(leftTime), GraftSqlBridge.expr(rightTime)))
  }
}
