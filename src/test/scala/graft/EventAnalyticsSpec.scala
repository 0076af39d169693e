package graft

import graft.operators.EventAnalytics
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def writeEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)])
      : String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ev").toString
    rows.map { case (id, t, u, ty, v) => (id, t, u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("funnel: stage order is strict — a click before the view is out") {
    val dir = writeEvents(Seq(
      // user 1 walks the whole funnel in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 1.0),
      // user 2 clicks BEFORE the first view: stage 1 only
      (4L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0),
      (5L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0),
      (6L, ts("2024-01-01 12:00:00"), 2L, "purchase", 1.0),
      // user 3 views only
      (7L, ts("2024-01-01 10:00:00"), 3L, "view", 1.0)))
    val got = EventAnalytics.funnelCounts(spark, dir)
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((1, "view", 3L), (2, "view>click", 1L),
      (3, "view>click>purchase", 1L)))
  }

  test("resample: per-day close, forward fill across gaps, span trim") {
    val dir = writeEvents(Seq(
      // user 1, day 0: two events — later one is the close
      (1L, ts("2024-01-01 08:00:00"), 1L, "view", 10.0),
      (2L, ts("2024-01-01 09:00:00"), 1L, "view", 11.0),
      // user 1, day 2 (gap at day 1 must fill with 11.0)
      (3L, ts("2024-01-03 08:00:00"), 1L, "view", 12.0),
      // user 2 appears only on day 3 (defines the global span end;
      // days 0-2 have no value for user 2 and are trimmed)
      (4L, ts("2024-01-04 08:00:00"), 2L, "view", 20.0)))
    val got = EventAnalytics.resampleForwardFill(spark, dir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 11.0, 1), (1L, 1L, 11.0, 0), (1L, 2L, 12.0, 1),
      (1L, 3L, 12.0, 0),
      (2L, 3L, 20.0, 1)))
  }

  test("retention: cohort week offsets count distinct users once") {
    val dir = writeEvents(Seq(
      // user 1 first seen week 0, active weeks 0 and 2 (twice in w2)
      (1L, ts("2024-01-01 08:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-15 08:00:00"), 1L, "view", 1.0),
      (3L, ts("2024-01-16 08:00:00"), 1L, "view", 1.0),
      // user 2 first seen week 2
      (4L, ts("2024-01-17 08:00:00"), 2L, "view", 1.0)))
    val got = EventAnalytics.retentionCohorts(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L)))
  }
}
