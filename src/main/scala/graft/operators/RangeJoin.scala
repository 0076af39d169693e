package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bin-partitioned interval join (point-in-range join).
  *
  * Spark has no native interval-overlap join: the naive formulation is a
  * join on a pure range predicate, which Catalyst can only plan as a
  * BroadcastNestedLoopJoin / cartesian product — O(|points|·|intervals|)
  * work and effectively single-stream at scale. This operator rewrites it
  * as an equi join: each interval is exploded into the fixed-width time
  * bins it overlaps, each point maps to exactly one bin, and the join runs
  * hash-partitioned on the bin key like any shuffle join — so it
  * parallelizes across a 1000-executor cluster. With bin width chosen near
  * the typical interval length the explode blow-up stays ~2×. An exact
  * containment filter after the equi join drops bin-boundary false
  * positives; since a point lands in exactly one bin, no dedup is needed.
  *
  * (The reference has no joins at all — SURVEY.md §2.3 — this is part of
  * the relational breadth built new, Spark-first.)
  */
object RangeJoin {

  /** Join `points` (timestamp `ptCol`) to `intervals` with timestamp
    * bounds [`startCol`, `endCol`) — end exclusive. Returns the matched
    * pairs with all columns of both inputs. Intervals with
    * `endCol <= startCol` are empty and dropped. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val p = points.withColumn("__bin",
      expr(s"unix_timestamp(`$ptCol`) div $binSeconds"))
    // Last bin uses the *untruncated* end: when the end has sub-second
    // fraction, truncated-seconds arithmetic would drop the final bin.
    // The extra boundary bin only produces false positives, which the
    // exact filter removes.
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        expr(s"unix_timestamp(`$startCol`) div $binSeconds"),
        expr(s"unix_timestamp(`$endCol`) div $binSeconds"))))
    p.join(i, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }

  /** Line items (any order's) shipped within one day after each order's
    * date, as a zero-preserving count per order. There is deliberately no
    * equi key between the two sides — this is the pure range-join case the
    * bin rewrite exists for (with an equi key, a plain hash join + filter
    * already scales). */
  def shipmentsInOrderWindow(s: SparkSession, dir: String): DataFrame = {
    // Eager aggregation: COUNT is distributive, so collapse the point side
    // to (distinct timestamp, partial count) BEFORE the range join — the
    // join input shrinks from |lineitem| rows to |distinct ship dates|
    // (~250× here), and the final per-order count is a SUM of partials.
    // This is the classic pre-join partial-agg rewrite, done by hand
    // because Catalyst won't push an aggregate below a custom join shape.
    val li = Tables.lineitem(s, dir)
      .groupBy(col("l_shipdate")).agg(count(lit(1)).as("cnt"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderdate").as("w_start"),
      (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("w_end"))
    val counts = pointInInterval(li, "l_shipdate", ord, "w_start", "w_end")
      .groupBy("o_orderkey").agg(sum("cnt").as("n_shipped"))
    ord.select("o_orderkey").join(counts, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .orderBy("o_orderkey")
  }
}
