package graft.tools

import graft.operators.Dedup
import graft.sources.Tables

/** Pair-recall sweep for the semantic-dedup cell bounding: for each
  * (cells, probes, lloydIters) config, counts cell-bounded τ-pairs vs
  * the exact global pair set and prints recall + survivor deltas — the
  * numbers behind semantic_dedup_gate's recallFloor. Usage:
  *   sbt "runMain graft.tools.SemDedupSweep [sfDir] [tau]"
  * Tuning tool, not part of the driver contract.
  */
object SemDedupSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.45)
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    val global = Dedup.embeddingNearDupPairs(emb, tau)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[sem-sweep] $dir tau=$tau exact pairs=${global.size}")
    val configs = Seq(
      (8, 1, 2), (8, 2, 2), (8, 3, 2), (8, 2, 3),
      (16, 2, 2), (16, 3, 2), (4, 2, 2))
    configs.foreach { case (cells, probes, iters) =>
      val t0 = System.nanoTime()
      val got = Dedup.semanticPairs(emb, tau, cells, iters, probes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val recall =
        if (global.isEmpty) 1.0
        else global.intersect(got).size.toDouble / global.size
      val extra = got.diff(global).size
      println(f"[sem-sweep] cells=$cells%3d probes=$probes%d iters=$iters%d  recall=$recall%.3f  found=${got.size}%3d  extra=$extra%d  $dt%6.2f s")
    }
    spark.stop()
  }
}
