package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
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
    // Bind once on the driver; type support is validated here (planning
    // time), not per row. All four columns read through the row's
    // primitive getters — no per-row boxing through Number.
    val lKeyA = new AsOfJoinExec.LongCol(leftKey, left.output)
    val lTimeA = new AsOfJoinExec.LongCol(leftTime, left.output)
    val rKeyA = new AsOfJoinExec.LongCol(rightKey, right.output)
    val rTimeA = new AsOfJoinExec.LongCol(rightTime, right.output)
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
        // null key/time on the right can never win a match — skip
        rCur = null
        while (rCur == null && rIter.hasNext) {
          val r = rIter.next()
          if (!rKeyA.isNull(r) && !rTimeA.isNull(r)) {
            rCur = r
            rCurKey = rKeyA.get(r)
            rCurTime = rTimeA.get(r)
          }
        }
      }
      advanceRight()
      lIter.map { l =>
        if (lKeyA.isNull(l) || lTimeA.isNull(l)) {
          // null key/time matches nothing: LEFT OUTER keeps the row
          outProj(joined(l, nullRight))
        } else {
          val lKey = lKeyA.get(l)
          val lTime = lTimeA.get(l)
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
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoinExec {
  /** Bound, null-aware long view of a key/time column. Integral, date,
    * and timestamp types map onto the sorted-long merge; anything else
    * is rejected when the accessor is built (driver side), so an
    * unsupported schema fails the job with a typed message instead of a
    * per-row ClassCastException on executors.
    */
  final class LongCol(e: Expression, output: Seq[Attribute]) extends Serializable {
    private val bound = BindReferences.bindReference(e, output)
    private val ordinal = bound match {
      case br: BoundReference => br.ordinal
      case _ => -1
    }
    private val getAt: (InternalRow, Int) => Long = bound.dataType match {
      case LongType | TimestampType | TimestampNTZType => (r, o) => r.getLong(o)
      case IntegerType | DateType                      => (r, o) => r.getInt(o).toLong
      case ShortType                                   => (r, o) => r.getShort(o).toLong
      case ByteType                                    => (r, o) => r.getByte(o).toLong
      case other => throw new IllegalArgumentException(
        s"as-of join key/time must be an integral, date, or timestamp column; got $other")
    }
    def isNull(r: InternalRow): Boolean =
      if (ordinal >= 0) r.isNullAt(ordinal) else bound.eval(r) == null
    def get(r: InternalRow): Long =
      if (ordinal >= 0) getAt(r, ordinal)
      else bound.eval(r).asInstanceOf[Number].longValue()
  }
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
