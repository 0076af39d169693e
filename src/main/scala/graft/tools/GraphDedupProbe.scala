package graft.tools

import graft.operators.Dedup
import graft.sources.Tables

/** Pair recall + survivor agreement of the graph-tier semantic dedup
  * vs the exact global pair set, at each SF — the floor-setting
  * evidence for `semantic_dedup_graph_gate` (the SemDedupSweep /
  * IvfPqProbe convention: measure, then pin the floor under the worst
  * measured value). Driver-side measurement tool, not a gated query. */
object GraphDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[16]", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val t0 = System.nanoTime()
      val row = Dedup.semanticDedupGraphGate(emb, tau = 0.45).head()
      val t = (System.nanoTime() - t0) / 1e9
      // recompute raw recall for floor-setting (gate only emits flags)
      val g = Dedup.semanticPairsGraph(emb, 0.45).localCheckpoint(true)
      val ex = Dedup.embeddingNearDupPairs(emb, 0.45)
        .select("id_a", "id_b").localCheckpoint(true)
      val nEx = ex.count()
      val nMiss = ex.join(g, Seq("id_a", "id_b"), "left_anti").count()
      val rec = if (nEx == 0) 1.0 else (nEx - nMiss).toDouble / nEx
      println(f"[$sf] gate=$row nExact=$nEx recall=$rec%.3f time=$t%.1f s")
    }
    spark.stop()
  }
}
