package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftaccess.PlanAccess

/** As-of join — the one operator in the declared surface Spark genuinely
  * lacks (option (c) of the engine's extension policy: full LogicalPlan +
  * SparkStrategy + SparkPlan, registered at runtime via
  * spark.experimental.extraStrategies).
  *
  * Semantics: inner as-of — each left row (k, t) pairs with the single
  * right row of the same key having the greatest rightTime ≤ t; left rows
  * with no prior right row are dropped. Matches DuckDB's
  * `ASOF JOIN ... ON l.k = r.k AND l.t >= r.t`, which is the oracle.
  *
  * Physical execution is a single-pass merge over both children, which
  * the planner requires to be hash-clustered on the key and sorted by
  * (key, time) — EnsureRequirements inserts the exchanges and sorts, so
  * at scale this costs exactly one shuffle per side (same as a
  * sort-merge join) and O(1) state per partition, never a buffered
  * range-join blow-up.
  *
  * Restrictions (documented, enforced by the API): single long-typed key,
  * long-typed (timestamp) time columns, no nulls in key/time. Callers
  * de-duplicate right rows sharing (key, time) first — otherwise the
  * within-tie winner is partition-order-dependent.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    outer: Boolean = false) extends BinaryNode {
  // LEFT outer keeps every left row; the right side is then nullable.
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    outer: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val toUnsafe = UnsafeProjection.create(schema, schema)
      val joined = new JoinedRow
      // All-null right extension for unmatched left rows (LEFT outer).
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(right.output.size)
      val rBuf = rIt.buffered
      new Iterator[InternalRow] {
        private var cand: InternalRow = null
        private var candKey: Long = 0L
        private var pending: InternalRow = null

        /** Consume right rows usable by a left row (k, t): everything with
          * a smaller key, plus same-key rows with time ≤ t. The last
          * same-key row consumed is the as-of candidate (right side is
          * sorted by (key, time)). Rows with time > t stay buffered for
          * later left rows. */
        private def advanceRight(k: Long, t: Long): Unit = {
          var continue = true
          while (continue && rBuf.hasNext) {
            val hk = rk.eval(rBuf.head).asInstanceOf[Long]
            if (hk < k) rBuf.next()
            else if (hk == k && rt.eval(rBuf.head).asInstanceOf[Long] <= t) {
              cand = rBuf.next().copy()
              candKey = k
            } else continue = false
          }
        }

        private def computeNext(): InternalRow = {
          while (lIt.hasNext) {
            val l = lIt.next()
            val k = lk.eval(l).asInstanceOf[Long]
            val t = lt.eval(l).asInstanceOf[Long]
            advanceRight(k, t)
            if (cand != null && candKey == k) return toUnsafe(joined(l, cand))
            if (outer) return toUnsafe(joined(l, nullRight))
          }
          null
        }

        override def hasNext: Boolean = {
          if (pending == null) pending = computeNext()
          pending != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Register the planner strategy once per session (public
    * ExperimentalMethods API — no extensions conf needed). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** left as-of-join right: latest right row with rightTime ≤ leftTime per
    * key. Key and time columns must be non-null long/timestamp. */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      outer: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val plan = AsOfJoinPlan(
      PlanAccess.analyzed(left), PlanAccess.analyzed(right),
      PlanAccess.attr(left, leftKey), PlanAccess.attr(right, rightKey),
      PlanAccess.attr(left, leftTime), PlanAccess.attr(right, rightTime),
      outer)
    PlanAccess.ofRows(spark, plan)
  }

  /** LEFT outer as-of: unmatched left rows survive with a null-extended
    * right side — same single merge pass (DuckDB: ASOF LEFT JOIN). */
  def asofLeft(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, outer = true)
}
