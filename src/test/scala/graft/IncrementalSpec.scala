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
}
