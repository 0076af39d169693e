package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Edge semantics of both as-of implementations (composed and native):
  * inclusive bound, tie-breaking, unmatched rows dropped (inner),
  * per-key isolation. The big-corpus equivalence is the shared DuckDB
  * oracle in the Verify gate. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // exact match boundary
    (2L, 10L, ts("2024-01-01 09:59:59")), // just before first right row
    (3L, 20L, ts("2024-01-01 12:00:00")), // key with two same-time rights
    (4L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows
  ).toDF("id", "k", "t")

  private val right = Seq(
    (10L, ts("2024-01-01 10:00:00"), 100L),
    (10L, ts("2024-01-01 11:00:00"), 101L),
    (20L, ts("2024-01-01 11:00:00"), 200L),
    (20L, ts("2024-01-01 11:00:00"), 201L) // same time: larger rid wins
  ).toDF("rk", "rt", "rid")

  test("composed as-of: inclusive bound, ties, inner semantics") {
    val got = AsOfJoin.asOfBackward(left, "k", "t", right, "rk", "rt")
      .select(col("id"), col("asof.rid"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 100L, 3L -> 201L))
  }

  test("native as-of: identical results to the composed operator") {
    val got = AsOfJoin.asOfBackwardNative(left, "k", "t",
        right, "rk", "rt", Seq("rid"))
      .select(col("id"), col("rid"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 100L, 3L -> 201L))
  }

  test("native as-of under repartitioning stays correct") {
    val got = AsOfJoin.asOfBackwardNative(
        left.repartition(7), "k", "t",
        right.repartition(3), "rk", "rt", Seq("rid"))
      .select(col("id"), col("rid"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 100L, 3L -> 201L))
  }
}
