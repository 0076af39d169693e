package graft.tools

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Recall/latency sweep for the knn_ivf codebook shape: runs brute-force
  * once as ground truth, then each (cells, nprobe, lloydIters) config,
  * printing recall@k and wall seconds. Usage:
  *   sbt "runMain graft.tools.IvfSweep [sfDir]"
  * Tuning tool, not part of the driver contract.
  */
object IvfSweep {
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
    val configs = Seq(
      (16, 4, 1), (16, 4, 3), (16, 5, 1), (16, 5, 3), (16, 6, 3),
      (16, 8, 3), (8, 3, 3), (8, 4, 3), (32, 8, 3), (32, 10, 3))
    configs.foreach { case (cells, nprobe, iters) =>
      val t0 = System.nanoTime()
      val got = Similarity.knnIvf(emb, q, k, cells, nprobe, iters)
        .select("query_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = bf.intersect(got).size.toDouble / bf.size
      println(f"[ivf-sweep] cells=$cells%3d nprobe=$nprobe%2d iters=$iters%d  recall@$k=$recall%.3f  n=${got.size}%4d  $dt%6.2f s")
    }
    spark.stop()
  }
}
