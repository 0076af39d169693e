package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Symmetric 4-node star: hub 1 <-> leaves 2, 3, 4. */
  private def star = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L),
    (2L, 1L), (3L, 1L), (4L, 1L))
    .toDF("src", "dst")

  test("one sweep of the star matches hand-computed fixed-point ranks") {
    val ranks = Graph.pageRank(star, iters = 1)
      .as[(Long, Long)].collect().toMap
    // hub: each leaf gives 1e9 DIV 1 → contrib 3e9;
    //   150000000 + (85 * 3000000000) DIV 100 = 2700000000
    assert(ranks(1L) === 2700000000L)
    // leaf: hub gives 1e9 DIV 3 = 333333333 → contrib 333333333;
    //   150000000 + (85 * 333333333) DIV 100 = 433333333
    for (leaf <- Seq(2L, 3L, 4L)) assert(ranks(leaf) === 433333333L)
  }

  test("zero iterations returns the uniform initial rank") {
    val ranks = Graph.pageRank(star, iters = 0)
      .as[(Long, Long)].collect().toMap
    assert(ranks.values.toSet === Set(Graph.Scale))
    assert(ranks.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("ranks are invariant to partition layout (integer arithmetic)") {
    val a = Graph.pageRank(star.repartition(1), iters = 3)
      .as[(Long, Long)].collect().toSet
    val b = Graph.pageRank(star.repartition(7, col("dst")), iters = 3)
      .as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("hub outranks leaves and all ranks stay positive") {
    val ranks = Graph.pageRank(star, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(ranks(1L) > ranks(2L))
    assert(ranks.values.forall(_ > 0L))
  }

  test("customer-supplier edges are symmetric with disjoint id ranges") {
    val dir = "/root/testdata/sf0.001"
    val e = Graph.customerSupplierEdges(spark, dir).cache()
    val fwd = e.filter(col("src") < Graph.SupplierOffset).count()
    val rev = e.filter(col("src") >= Graph.SupplierOffset).count()
    assert(fwd === rev)
    assert(fwd > 0)
    // every forward edge's mirror is present
    val asym = e.as("x").join(e.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src"),
        "left_anti").count()
    assert(asym === 0L)
    e.unpersist()
  }

  test("per-iteration plans stay constant-size (lineage truncated)") {
    val p3 = Graph.pageRank(star, iters = 3)
      .queryExecution.executedPlan.toString
    val p6 = Graph.pageRank(star, iters = 6)
      .queryExecution.executedPlan.toString
    // checkpointed: the final plan is one join round off a LogicalRDD,
    // not a 2x-deeper tree
    assert(math.abs(p3.length - p6.length) < p3.length / 2,
      s"plan grew with iteration count:\n$p6")
  }
}
