package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The binned interval join must be pair-identical to the naive
  * cross-join-with-range-predicate formulation, across bin widths —
  * including intervals spanning many bins, boundary points, sub-second
  * interval ends, and empty intervals. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (1L, ts("2024-01-01 00:00:00.0")), // exact interval start: included
    (2L, ts("2024-01-02 00:00:00.0")), // exact interval end: excluded
    (3L, ts("2024-01-01 23:59:59.5")), // just inside, fractional second
    (4L, ts("2024-01-05 12:00:00.0")), // inside the long interval only
    (5L, ts("2023-12-31 23:59:59.9"))  // before everything
  ).toDF("pid", "pt")

  private val intervals = Seq(
    (10L, ts("2024-01-01 00:00:00.0"), ts("2024-01-02 00:00:00.0")),
    (11L, ts("2024-01-03 00:00:00.0"), ts("2024-01-07 00:00:00.0")), // 4 bins
    (12L, ts("2024-01-01 12:00:00.0"), ts("2024-01-01 23:59:59.7")), // frac end
    (13L, ts("2024-01-04 00:00:00.0"), ts("2024-01-04 00:00:00.0"))  // empty
  ).toDF("iid", "s", "e")

  private def naive = points.crossJoin(intervals)
    .filter(col("pt") >= col("s") && col("pt") < col("e"))
    .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("binned join equals naive cross-join filter across bin widths") {
    val expected = naive
    assert(expected === Set((1L, 10L), (3L, 10L), (3L, 12L), (4L, 11L)))
    for (bin <- Seq(3600L, 86400L, 7L * 86400L)) {
      val got = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e",
          binSeconds = bin)
        .select("pid", "iid").as[(Long, Long)].collect().toList
      assert(got.toSet === expected, s"bin=$bin")
      assert(got.size === got.toSet.size, s"bin=$bin produced duplicates")
    }
  }

  private val ivalsB = Seq(
    (20L, ts("2024-01-01 06:00:00.0"), ts("2024-01-01 18:00:00.0")), // inside 10
    (21L, ts("2024-01-02 00:00:00.0"), ts("2024-01-03 00:00:00.0")), // abuts 10
    (22L, ts("2024-01-06 23:00:00.0"), ts("2024-01-08 00:00:00.0")), // tail of 11
    (23L, ts("2024-01-03 00:00:00.0"), ts("2024-01-03 00:00:00.0"))  // empty
  ).toDF("jid", "s2", "e2")

  test("interval overlap join equals the naive form across bin widths") {
    val expected = intervals.crossJoin(ivalsB)
      .filter(col("s") < col("e2") && col("s2") < col("e"))
      .select("iid", "jid").as[(Long, Long)].collect().toSet
    // end-exclusive: interval 21 abuts 10 AND 11 exactly → overlaps
    // neither; 20 overlaps both 10 and the fractional-end 12; the empty
    // intervals (13, 23) match nothing
    assert(expected === Set((10L, 20L), (12L, 20L), (11L, 22L)))
    for (bin <- Seq(3600L, 86400L, 7L * 86400L)) {
      val got = RangeJoin.intervalOverlap(intervals, "s", "e",
          ivalsB, "s2", "e2", binSeconds = bin)
        .select("iid", "jid").as[(Long, Long)].collect().toList
      assert(got.toSet === expected, s"bin=$bin")
      assert(got.size === got.toSet.size, s"bin=$bin produced duplicates")
    }
  }

  test("concurrent sessions equals a naive session self-join") {
    val dir = "/root/testdata/sf0.001"
    val sess = graft.sources.Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)))
      .select(col("user_id"), col("sw.start").as("st"), col("sw.end").as("en"))
    val a = sess.select(col("user_id").as("ua"), col("st").as("sa"), col("en").as("ea"))
    val b = sess.select(col("user_id").as("ub"), col("st").as("sb"), col("en").as("eb"))
    val naivePairs = a.crossJoin(b)
      .filter(col("ua") < col("ub") && col("sa") < col("eb") && col("sb") < col("ea"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val got = RangeJoin.concurrentSessions(spark, dir)
      .select("user_a", "user_b", "n_session_pairs")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === naivePairs)
    assert(got.nonEmpty)
  }

  test("shipped_in_order_window preserves zero-count orders") {
    val df = RangeJoin.shipmentsInOrderWindow(spark, "/root/testdata/sf0.001")
    val n = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001").count()
    assert(df.count() === n) // one row per order, zeros preserved
    assert(df.filter(col("n_shipped") > 0).count() > 0)
  }
}
