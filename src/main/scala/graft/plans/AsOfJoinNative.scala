package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** Whole-operator extension tier (SURVEY.md §7.2 option (c)): an
  * as-of join as a first-class Catalyst operator — logical node,
  * planner strategy, and physical sort-merge exec.
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] (every left row
  * gets the latest right row with equal key and right ts ≤ left ts,
  * or NULLs): the compositional version is the cross-check oracle in
  * AsOfNativeSpec, alongside DuckDB's native ASOF JOIN.
  *
  * Execution: both sides are clustered on the key and sorted by
  * (key, ts) — declared via requiredChildDistribution/Ordering, so
  * Catalyst inserts exactly one exchange + sort per side — then each
  * partition pair is merged with a single forward pass holding at
  * most ONE candidate right row (vs the window formulation, which
  * materializes the union). v1 restriction: key and ts must be
  * non-null LongType columns.
  *
  * Tie contract: when several right rows share the winning (key, ts),
  * ONE of them is attached — which one is not defined, because the
  * required ordering sorts only (key, ts) and leaves intra-tie order
  * to partition layout. The compositional window formulation and
  * DuckDB's ASOF JOIN have the same property, so the three agree
  * whenever tied rows carry identical payloads (AsOfSemanticsSpec
  * pins exactly that); pre-aggregate the right side if tied rows can
  * differ and determinism matters.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Ordinal of a bound key/ts expression in `attrs`: the v1 operator
    * only ever receives plain attributes, so the merge loop can read
    * primitives straight off the row (`getLong`) instead of paying an
    * interpreted `eval` + Long box per comparison — the boxing showed
    * up as the native exec benching SLOWER than the window
    * formulation at sf0.1 despite the better memory shape. */
  private def ordinalOf(e: Expression, attrs: Seq[Attribute]): Int = e match {
    case a: Attribute =>
      val i = attrs.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"$a not found in $attrs")
      i
    case other =>
      throw new IllegalArgumentException(
        s"as-of v1 requires plain column references, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = ordinalOf(leftKey, left.output)
    val ltOrd = ordinalOf(leftTs, left.output)
    val rkOrd = ordinalOf(rightKey, right.output)
    val rtOrd = ordinalOf(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var held: InternalRow = null
      var heldKey: Long = 0L
      lIter.map { lRow =>
        val k = lRow.getLong(lkOrd)
        val t = lRow.getLong(ltOrd)
        if (held != null && heldKey != k) held = null
        var advancing = true
        while (advancing && rRow != null) {
          val rk = rRow.getLong(rkOrd)
          if (rk < k || (rk == k && rRow.getLong(rtOrd) <= t)) {
            if (rk == k) { held = rRow.copy(); heldKey = k }
            rRow = if (rIter.hasNext) rIter.next() else null
          } else advancing = false
        }
        val out =
          if (held != null && heldKey == k) joiner(lRow, held)
          else joiner(lRow, nullRight)
        proj(out)
      }
    }
  }
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** Register the planner strategy on a session (idempotent). The
    * extensions-config route is `GraftExtensions`. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }

  /** As-of join as a native operator. Key and ts columns must be
    * non-null longs (v1 restriction, see class doc). Output: all left
    * columns, then all right columns from the matched as-of row
    * (NULLs when no match).
    *
    * Self-join safety: the common as-of shape derives BOTH sides from
    * one table, so the same attribute (by exprId) can appear in both
    * legs — Catalyst's ColumnPruning then treats the two occurrences
    * as one and prunes the right key out from under the exec's
    * reference binding (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at run
    * time). When an overlap is detected the right side is re-aliased
    * to fresh exprIds here, same as the manual alias round-trip
    * AsOfNativeSpec uses. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTsCol: String, rightTsCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan =
      if (rAnalyzed.outputSet.intersect(lPlan.outputSet).nonEmpty)
        Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
      else rAnalyzed
    def attr(p: LogicalPlan, n: String): Expression =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    DatasetBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, keyCol), attr(rPlan, keyCol),
        attr(lPlan, leftTsCol), attr(rPlan, rightTsCol)))
  }
}
