package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.ColumnBridge

/** As-of join as a first-class operator: for every left row
  * (key, time), attach the right row with the greatest right-time ≤
  * left-time for the same key (LEFT OUTER semantics — unmatched left
  * rows keep nulls).
  *
  * Whole-operator custom plan (SURVEY §3 preference (c)): a logical
  * node, a planner Strategy, and a physical exec whose
  * requiredChildDistribution/Ordering make Catalyst co-partition both
  * sides by key and sort them by (key, time) — the operator itself is
  * then a single streaming merge per partition: O(n), no window state,
  * no broadcast of either side. This is the shape that survives 100 TB:
  * one shuffle each side, partition-local everything after.
  *
  * The right side must be unique per (key, time) — pre-aggregate ties
  * upstream (cf. EventOps.asofJoinEventsOrders) — otherwise the winner
  * among equal times is undefined.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs.map(a => a: Expression), outAttrs)
      // buffered right cursor
      var rCur: InternalRow = null
      var rCurKey = 0L; var rCurTime = 0L
      var rHeld: InternalRow = null   // last right row matched for current key
      var rHeldKey = 0L; var rHeldTime = 0L; var rHeldValid = false
      def advanceRight(): Unit = {
        if (rIter.hasNext) {
          val r = rIter.next()
          rCur = r
          rCurKey = rKeyB.eval(r).asInstanceOf[Number].longValue()
          rCurTime = rTimeB.eval(r).asInstanceOf[Number].longValue()
        } else rCur = null
      }
      advanceRight()
      lIter.map { l =>
        val lKey = lKeyB.eval(l).asInstanceOf[Number].longValue()
        val lTime = lTimeB.eval(l).asInstanceOf[Number].longValue()
        // drop held match from a previous key
        if (rHeldValid && rHeldKey != lKey) rHeldValid = false
        // consume right rows with (key < lKey) or (key == lKey && time <= lTime)
        while (rCur != null &&
          (rCurKey < lKey || (rCurKey == lKey && rCurTime <= lTime))) {
          if (rCurKey == lKey) {
            rHeld = rCur.copy(); rHeldKey = rCurKey; rHeldTime = rCurTime
            rHeldValid = true
          }
          advanceRight()
        }
        val rSide = if (rHeldValid && rHeldKey == lKey && rHeldTime <= lTime) rHeld
          else nullRight
        outProj(joined(l, rSide))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOf {
  /** Register the planner strategy (idempotent). Also usable via
    * spark.sql.extensions=graft.plans.GraftExtensions for submitted jobs.
    */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** API: asOfJoin(events, orders, "user_id" → "o_custkey",
    * "ts" → "o_orderdate") by column name. Right side must be unique
    * per (key, time).
    */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    register(spark)
    val lPlan = ColumnBridge.logicalPlan(left)
    val rPlan = ColumnBridge.logicalPlan(right)
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime)))
  }
}

/** SparkSessionExtensions installer for spark-submit users:
  * --conf spark.sql.extensions=graft.plans.GraftExtensions
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
}
