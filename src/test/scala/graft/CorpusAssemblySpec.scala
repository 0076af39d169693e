package graft

import graft.operators.{CorpusAssembly, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capstone invariants that hold on ANY corpus draw (the exact-value
  * gate is the driver's corpus_assembly oracle; these pin the pieces a
  * hash can't see).
  */
class CorpusAssemblySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("LSH-tier pairs are contained in the exact tier at the same tau") {
    // the production tier may MISS mid-Jaccard pairs (bounded candidate
    // generation) but can never invent one: every verified candidate
    // passes the same exact-Jaccard predicate the all-pairs tier uses
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val exact = Dedup.jaccardPairsAuto(docs, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.jaccardVerifyPairs(docs,
        Dedup.minhashLshPairs(docs, 32, 8, 0.4), 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"LSH tier invented pairs: ${lsh.diff(exact).take(5)}")
  }

  test("lshTier capstone runs end-to-end with the same output contract") {
    // downstream stages (mixture rates, shard positions) legitimately
    // shift when the dedup tier keeps a different survivor set, so the
    // cross-tier pin is the PAIR containment above; here the production
    // tier must compose end-to-end: same schema, nonempty shards, and
    // positions contiguous per shard
    val out = CorpusAssembly.corpusAssembly(spark, dir, lshTier = true)
    assert(out.schema.fieldNames.toSeq ===
      Seq("doc_id", "epoch", "lang", "n_toks", "shard", "pos"))
    val rows = out.select("shard", "pos").as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (s, ps) =>
      val sorted = ps.map(_._2).sorted
      assert(sorted.toSeq === (1 to sorted.length).toSeq,
        s"shard $s positions not contiguous")
    }
  }
}
