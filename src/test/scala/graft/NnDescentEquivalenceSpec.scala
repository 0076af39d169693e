package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDoubleVec
import graft.functions.VectorExpressions.dot_native
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused NN-Descent round (one window pass for both incidence
  * sets + collect_set local pair generation, Similarity.nnDescendRounds)
  * against an UNFUSED reference: the r19 form that ran incidence() twice
  * (two window sorts, two distincts) and generated candidates through a
  * node-keyed self-join. The fusion claims the candidate SET per round is
  * identical — the subset's row_number equals the running activated count
  * in the shared total order — so the converged graph must be row-equal,
  * sims included. A future edit that breaks the shared-order argument
  * (e.g. a different salt per incidence call, or a tie-capable ordering)
  * must fail HERE loudly rather than silently shifting gated recalls. */
class NnDescentEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  /** Reference cold build — the pre-fusion r19 round arithmetic, copied
    * verbatim (rho = 1 is the shipped default; resume/registry paths
    * dropped — the test compares pure dataflow). */
  private def referenceGraph(emb: DataFrame, k: Int): DataFrame = {
    val kb = 2 * k
    val iters = 5; val initRounds = 4; val bucketSize = 8
    val seed = 41L
    def unit(v: Column): Column = {
      val n = sqrt(dot_native(v, v))
      when(n > lit(0.0d), transform(v, x => x / n)).otherwise(v)
    }
    val u = emb.select(col("vec_id"),
      unit(toDoubleVec(col("embedding"))).as("v")).localCheckpoint(true)
    val n = u.count()
    require(n >= 2, "test corpus too small")
    val nBuckets = math.max(1L, n / bucketSize)
    def nnScore(pairs: DataFrame): DataFrame =
      pairs
        .join(u.select(col("vec_id").as("a"), col("v").as("va")), Seq("a"))
        .join(u.select(col("vec_id").as("b"), col("v").as("vb")), Seq("b"))
        .select(col("a"), col("b"),
          round(dot_native(col("va"), col("vb")), 6).as("sim"))
    def nnTopK(fresh: DataFrame, prior: DataFrame): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(desc("sim"), asc("nn_id"))
      fresh.select(col("a").as("query_id"), col("b").as("nn_id"),
          col("sim"), lit(false).as("tried"))
        .unionAll(fresh.select(col("b").as("query_id"),
          col("a").as("nn_id"), col("sim"), lit(false).as("tried")))
        .unionAll(prior.select("query_id", "nn_id", "sim", "tried"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= kb)
        .select("query_id", "nn_id", "sim", "rn", "tried")
    }
    val rounds = (0 until initRounds).map { r =>
      u.select(col("vec_id"), lit(r).as("r"),
        pmod(xxhash64(col("vec_id"), lit(seed + r)), lit(nBuckets))
          .as("bkt"))
    }.reduce(_ unionAll _)
    val initPairs = rounds.as("x").join(rounds.as("y"), Seq("r", "bkt"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val empty = u.select(col("vec_id").as("query_id"),
      col("vec_id").as("nn_id"), lit(0.0d).as("sim"), lit(0).as("rn"),
      lit(false).as("tried")).filter(lit(false))
    var g = nnTopK(nnScore(initPairs), empty).localCheckpoint(true)
    def incidence(edges: DataFrame, round: Int): DataFrame = {
      val fwd = edges
        .select(col("query_id").as("node"), col("nn_id").as("nb"))
      val wR = Window.partitionBy("node")
        .orderBy(
          xxhash64(col("node"), col("nb"), lit(seed + 3000 + round)),
          col("nb"))
      val rev = edges
        .select(col("nn_id").as("node"), col("query_id").as("nb"))
        .withColumn("rr", row_number().over(wR))
        .filter(col("rr") <= kb).drop("rr")
      fwd.unionAll(rev).distinct()
    }
    for (i <- 1 to iters) {
      val act = g.filter(!col("tried"))
      val incNew = incidence(act, i)
      val incAll = incidence(g, i)
      val cand = incNew.as("x").join(incAll.as("y"), Seq("node"))
        .filter(col("x.nb") =!= col("y.nb"))
        .select(least(col("x.nb"), col("y.nb")).as("a"),
          greatest(col("x.nb"), col("y.nb")).as("b"))
        .distinct()
      val cur = g.select(least(col("query_id"), col("nn_id")).as("a"),
        greatest(col("query_id"), col("nn_id")).as("b")).distinct()
      val fresh = cand.join(cur, Seq("a", "b"), "left_anti")
      val prior = g.withColumn("tried", lit(true))
      g = nnTopK(nnScore(fresh), prior).localCheckpoint(true)
    }
    g.filter(col("rn") <= k).select("query_id", "nn_id", "sim", "rn")
  }

  test("fused descent rounds converge to the exact pre-fusion graph") {
    val emb = Tables.embeddings(spark, dir)
    Similarity.clearNnGraphCacheForTest()
    val k = 10
    def rows(df: DataFrame) = df
      .select("query_id", "nn_id", "sim", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val fused = rows(Similarity.knnGraphNnDescent(emb, k))
    val ref = rows(referenceGraph(emb, k))
    assert(ref.nonEmpty)
    assert(fused === ref)
    // the mixed tried/untried rounds were genuinely exercised: the
    // final graph must hold more than the init round could produce
    // alone (descent added edges), otherwise the equality is vacuous
    val n = emb.count()
    assert(fused.size.toLong ==
      n * math.min(k.toLong, math.max(n - 1, 0L)))
  }
}
