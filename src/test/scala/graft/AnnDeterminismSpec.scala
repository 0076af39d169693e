package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the deterministic tie-break ordering of the IVFADC probe
  * ([[Similarity.knnIvfPq]] → `knnIvfPqWith`): the shortlist window
  * orders by (approx_d ASC, nn_id ASC) and the re-rank window by
  * (sim DESC, nn_id ASC), so the probe is a pure function of its
  * inputs. `ivfpq_compact_gate`'s `probe_eq` flag is INFERRED from
  * that determinism (bit-equal models + fingerprint-equal code rows ⇒
  * row-equal probes, Similarity.scala `probe_eq`), so a future edit
  * that weakens the ranking tie-breaks must re-fail HERE loudly
  * rather than silently hollowing the gate (r18 advice).
  *
  * The corpus plants exact-duplicate vectors: duplicates produce
  * exact `sim` ties (and exact `approx_d` ties — identical codes), so
  * the nn_id tie-break is genuinely load-bearing in this test, not
  * just latent.
  */
class AnnDeterminismSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("ivfpq probe is row-identical across repeated executions, ties included") {
    val emb = Tables.embeddings(spark, dir)
    // plant ties: clone every vector under a shifted id — each query's
    // neighborhood now contains at least one exact sim/approx_d tie
    val cloned = emb.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val corpus = emb.unionByName(cloned)
    val queries = emb.filter(col("vec_id") < 8)
    def run() = Similarity.knnIvfPq(corpus, queries, 10)
      .select("query_id", "nn_id", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._3))
      .toSeq
    val a = run()
    val b = run()
    assert(a.nonEmpty)
    assert(a === b)
    // ties actually exercised: some neighbor list contains a planted
    // clone (id >= 1e6) next to its original's similarity
    assert(a.exists(_._2 >= 1000000L))
    // rn is a dense 1..k ranking per query
    val perQuery = a.groupBy(_._1)
    perQuery.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size).toSeq)
    }
  }
}
