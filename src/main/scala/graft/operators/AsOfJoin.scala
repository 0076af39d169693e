package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the most recent right row
  * with the same key and right.time <= left.time (backward direction).
  *
  * Spark lacks this operator; per the preference order we compose
  * built-ins rather than write a SparkPlan: tag both sides, union them,
  * and run `last_value(payload) IGNORE NULLS` over a per-key window
  * ordered by (time, side, payload). That is exactly the merge a native
  * as-of join performs — one hash shuffle on the key, one sort within
  * partitions, zero row amplification — so it scales like a sort-merge
  * join regardless of how many right rows precede each left row
  * (a naive range-join + groupBy explodes quadratically instead).
  *
  * Ties on right.time resolve to the largest payload (struct-lexicographic,
  * so order the payload's first fields as the desired tie-break); the
  * right row AT the left timestamp is visible (inclusive bound) because
  * right rows sort before left rows at equal time.
  */
object AsOfJoin {

  /** Inner backward as-of join. Right columns come back nested under
    * `asof` (callers project `col("asof.x")`), keeping names collision-free. */
  def asOfBackward(left: DataFrame, leftKey: String, leftTime: String,
                   right: DataFrame, rightKey: String, rightTime: String)
      : DataFrame = {
    val payload = struct(right.columns.toIndexedSeq.map(col): _*)
    val r = right.select(
      col(rightKey).as("__key"), col(rightTime).as("__time"),
      lit(0).as("__side"), payload.as("asof"))
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__time", col(leftTime))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy("__key")
      .orderBy(col("__time").asc, col("__side").asc, col("asof").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof", last("asof", ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("asof").isNotNull)
      .drop("__key", "__time", "__side")
  }

  /** The same join as a native physical operator (plans.AsOfJoinExec):
    * hash-clustered + (key,time)-sorted children, single forward merge
    * per partition. Registers the planner strategy on the session if
    * needed, so it works with or without GraftExtensions. Output columns
    * are left ++ right (flat, not nested). */
  def asOfBackwardNative(left: DataFrame, leftKey: String, leftTime: String,
                         right: DataFrame, rightKey: String, rightTime: String,
                         rightTieBreak: Seq[String] = Nil): DataFrame = {
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime),
        rightTieBreak.map(attr(rPlan, _))))
  }
}
