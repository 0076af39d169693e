package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator tier of the custom-op preference order (SURVEY.md §7 /
  * design notes (c)): a native backward as-of join as
  * LogicalPlan + Strategy + SparkPlan.
  *
  * Physical contract: both children hash-clustered on the key and sorted
  * by (key, time, tieBreak…); `doExecute` is then a single forward merge
  * per co-partition — each right row is touched once, the remembered
  * best-match is O(1) state, no row amplification at any point. This is
  * the plan shape a Flink/kdb-style temporal join engine uses, expressed
  * as a first-class Spark operator. Semantics (inclusive backward bound,
  * largest (time, tieBreak) wins ties) are identical to
  * operators.AsOfJoin.asOfBackward — both are checked against the same
  * DuckDB lateral-subquery oracle.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTieBreak: Seq[Expression])
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTieBreak: Seq[Expression])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outputAttrs = output
    val leftWidth = left.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var heldKey: Any = null
      var heldRow: InternalRow = null

      lIter.flatMap { lRow =>
        val k = lk.eval(lRow)
        val t = lt.eval(lRow)
        if (k == null || t == null) Iterator.empty
        else {
          // consume right rows up to and including (k, t); remember the
          // last one with exactly key k (sorted ⇒ max (time, tieBreak))
          var advance = true
          while (advance && rBuf.hasNext) {
            val rh = rBuf.head
            val rkv = rk.eval(rh)
            val rtv = rt.eval(rh)
            if (rkv == null || rtv == null) { rBuf.next() }
            else {
              val c = keyOrd.asInstanceOf[Ordering[Any]].compare(rkv, k)
              if (c < 0 ||
                  (c == 0 &&
                   timeOrd.asInstanceOf[Ordering[Any]].compare(rtv, t) <= 0)) {
                val r = rBuf.next()
                if (c == 0) { heldKey = rkv; heldRow = r.copy() }
              } else advance = false
            }
          }
          if (heldRow != null && heldKey != null &&
              keyOrd.asInstanceOf[Ordering[Any]].compare(heldKey, k) == 0)
            Iterator.single(proj(joined(lRow, heldRow)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
