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

  /** Interval–interval OVERLAP join, the general case of the same bin
    * rewrite: both sides explode into the fixed-width bins they cover
    * and the join runs hash-partitioned on the bin key. A pair can share
    * several bins, so instead of a distinct pass each surviving pair is
    * kept only in the bin containing the overlap's FIRST instant
    * (`max(lStart, rStart)`) — that bin lies in both sides' ranges by
    * construction, making the dedup a scan-local filter instead of a
    * second shuffle. Intervals are end-exclusive; empty intervals drop. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binned(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s)).withColumn("__bin", explode(sequence(
        expr(s"unix_timestamp(`$s`) div $binSeconds"),
        expr(s"unix_timestamp(`$e`) div $binSeconds"))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("__bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(expr(
        s"greatest(unix_timestamp(`$lStart`), unix_timestamp(`$rStart`))" +
          s" div $binSeconds") === col("__bin"))
      .drop("__bin")
  }

  /** Concurrent-session analysis — the interval-overlap demo over the
    * sessionization output: for every pair of users, how many of their
    * sessions overlapped in time and for how long in total. Overlap
    * durations are integer epoch-second differences (exact, no float
    * summation order to disagree on). The naive formulation is a session
    * self-CROSS-join on the overlap predicate; the bin rewrite keeps it
    * a shuffle join. */
  def concurrentSessions(s: SparkSession, dir: String,
                         gap: String = "30 minutes"): DataFrame = {
    // both join legs read the session set — checkpoint it so the events
    // scan + session aggregation run once, not once per leg (same
    // multi-consumer materialization as the exact-Jaccard posting index)
    val sess = Tables.events(s, dir)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("st"), col("sw.end").as("en"))
      .localCheckpoint()
    val a = sess.select(col("user_id").as("user_a"),
      col("st").as("st_a"), col("en").as("en_a"))
    val b = sess.select(col("user_id").as("user_b"),
      col("st").as("st_b"), col("en").as("en_b"))
    intervalOverlap(a, "st_a", "en_a", b, "st_b", "en_b", 3600L)
      .filter(col("user_a") < col("user_b")) // cross-user, each pair once
      .groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("n_session_pairs"),
        sum(expr("unix_timestamp(least(en_a, en_b))") -
          expr("unix_timestamp(greatest(st_a, st_b))"))
          .as("overlap_seconds"))
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
  }
}
