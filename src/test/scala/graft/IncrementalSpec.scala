package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def base = (0L until 30L)
    .map(i => (i, s"text $i", if (i % 2 == 0) "en" else "es", "s", 6L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mergeUpsert applies upserts, inserts, and deletes exactly once") {
    val merged = Incremental
      .mergeUpsert(base, Incremental.syntheticDelta(base), "doc_id")
      .select("doc_id", "row_status", "text")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // deletes: 0, 13, 26 are gone (0 is ÷7 AND ÷13 → delete wins by
    // construction: it never enters the upsert leg)
    for (id <- Seq(0L, 13L, 26L)) assert(!merged.contains(id), s"doc $id")
    // revisions: ÷7 not ÷13 → updated with the new text
    for (id <- Seq(7L, 14L, 21L, 28L)) {
      assert(merged(id) === (("updated", s"text $id [revised]")), s"doc $id")
    }
    // untouched rows survive verbatim
    for (id <- Seq(1L, 2L, 12L)) {
      assert(merged(id) === (("kept", s"text $id")), s"doc $id")
    }
    // inserts: first 25 re-keyed to +30000, original text
    for (id <- 0L until 25L) {
      assert(merged(id + 30000L) === (("inserted", s"text $id")), s"doc $id")
    }
    // cardinality: 30 base − 3 deletes + 25 inserts
    assert(merged.size === 52)
  }

  test("merge plan is a single co-partitioned join — no extra exchange") {
    val plan = Incremental
      .mergeUpsert(base, Incremental.syntheticDelta(base), "doc_id")
      .queryExecution.executedPlan.toString
    val joins = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(joins === 1, s"expected exactly one shuffle join:\n$plan")
  }

  test("merging an empty delta is the identity (statuses all kept)") {
    val empty = Incremental.syntheticDelta(base).limit(0)
    val merged = Incremental.mergeUpsert(base, empty, "doc_id")
    assert(merged.count() === 30)
    assert(merged.filter(col("row_status") =!= "kept").count() === 0)
    val texts = merged.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(texts(5L) === "text 5")
  }

  private def scdOrders = Seq(
    // cust 1: HIGH, HIGH, LOW, HIGH → 3 versions
    (1L, 10L, "2024-01-01 00:00:00", "HIGH"),
    (1L, 11L, "2024-02-01 00:00:00", "HIGH"),
    (1L, 12L, "2024-03-01 00:00:00", "LOW"),
    (1L, 13L, "2024-04-01 00:00:00", "HIGH"),
    // cust 2: a single never-changing priority → 1 open version
    (2L, 20L, "2024-01-15 00:00:00", "MED"),
    (2L, 21L, "2024-05-15 00:00:00", "MED"),
    // cust 3: same-timestamp orders — orderkey breaks the tie, so the
    // LOW (key 31) follows the HIGH (key 30) deterministically
    (3L, 30L, "2024-06-01 00:00:00", "HIGH"),
    (3L, 31L, "2024-06-01 00:00:00", "LOW"))
    .toDF("o_custkey", "o_orderkey", "ts", "o_orderpriority")
    .withColumn("o_orderdate", col("ts").cast("timestamp"))
    .drop("ts")

  test("scd2History compresses runs into effective-dated versions") {
    val rows = Incremental.scd2History(scdOrders)
      .as[(Long, Long, String, String, String, Long)].collect()
    val c1 = rows.filter(_._1 == 1L)
    assert(c1.map(r => (r._2, r._3, r._4, r._5, r._6)).toSeq === Seq(
      (1L, "HIGH", "2024-01-01 00:00:00", "2024-03-01 00:00:00", 2L),
      (2L, "LOW", "2024-03-01 00:00:00", "2024-04-01 00:00:00", 1L),
      (3L, "HIGH", "2024-04-01 00:00:00", "9999-12-31 00:00:00", 1L)))
    // stable priority: one open-ended version covering both orders
    val c2 = rows.filter(_._1 == 2L)
    assert(c2.map(r => (r._2, r._3, r._5, r._6)).toSeq ===
      Seq((1L, "MED", "9999-12-31 00:00:00", 2L)))
    // tie on timestamp: key order decides, intervals still contiguous
    val c3 = rows.filter(_._1 == 3L)
    assert(c3.map(r => (r._2, r._3, r._6)).toSeq ===
      Seq((1L, "HIGH", 1L), (2L, "LOW", 1L)))
    assert(c3(0)._5 === c3(1)._4) // v1.valid_to == v2.valid_from
  }

  test("scd2 versions chain: valid_to always meets the next valid_from") {
    val rows = Incremental
      .scd2History(graft.sources.Tables.orders(spark,
        "/root/testdata/sf0.001"))
      .as[(Long, Long, String, String, String, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.head._2 === 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 === b._4)
        case _ =>
      }
      assert(sorted.last._5 === "9999-12-31 00:00:00")
    }
  }

  test("cascadeDeleteAudit purges transitively and checksums survivors") {
    import graft.operators.Relational
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    val rows = Relational.cascadeDeleteAudit(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet === Set("customer", "events", "orders", "lineitem"))
    // recompute expectations independently
    val doomed = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0)
      .select("c_custkey").as[Long].collect().toSet
    assert(doomed.nonEmpty, "fixture needs at least one doomed user")
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
    val doomedOrders = orders.filter(o => doomed(o._2)).map(_._1).toSet
    assert(rows("customer")._4 === doomed.size.toLong)
    assert(rows("orders")._4 === doomedOrders.size.toLong)
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
      .as[Long].collect()
    assert(rows("lineitem")._4 === li.count(doomedOrders).toLong)
    assert(rows("lineitem")._5 ===
      li.filterNot(doomedOrders).sum)
    // conservation: before = after + purged, everywhere
    rows.values.foreach { r =>
      assert(r._2 === r._3 + r._4, r._1)
    }
  }

  test("cascade purge joins broadcast the doomed key sets") {
    import graft.operators.Relational
    val plan = Relational.cascadeDeleteAudit(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    // 4 anti-joins + the doomed-order derivation, all broadcast — a
    // shuffled purge join would mean moving the 100 TB side
    assert(bhj >= 5, s"expected broadcast anti-joins:\n$plan")
  }

  test("scd2 plan shuffles once on the dimension key") {
    val plan = Incremental.scd2History(scdOrders)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx === 1,
      s"windows + island agg should share one key shuffle:\n$plan")
  }
}
