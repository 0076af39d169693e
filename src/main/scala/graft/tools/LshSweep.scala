package graft.tools

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Recall/latency sweep for the knn_lsh signature shape: runs brute-force
  * once as ground truth, then each (nBits, bands) config, printing
  * recall@k and wall seconds. Usage:
  *   sbt "runMain graft.tools.LshSweep [sfDir]"
  * Tuning tool, not part of the driver contract.
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    val k = 5
    val bf = Similarity.knnBruteForce(emb, q, k)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LshSignBits packs the signature in a long: nBits <= 62
    val configs = Seq((16, 4), (24, 8), (32, 8), (32, 4), (40, 8), (48, 8),
      (48, 12), (56, 8), (60, 12), (60, 20))
    configs.foreach { case (nBits, bands) =>
      val t0 = System.nanoTime()
      val got = Similarity.knnLsh(emb, q, k, nBits, bands)
        .select("query_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = bf.intersect(got).size.toDouble / bf.size
      println(f"[lsh-sweep] nBits=$nBits%3d bands=$bands%3d r=${nBits / bands}%2d  recall@$k=$recall%.3f  n=${got.size}%4d  $dt%6.2f s")
    }
    spark.stop()
  }
}
