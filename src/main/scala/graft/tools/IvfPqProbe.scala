package graft.tools
import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Measures the composed IVF×PQ tier's recall@5 against the exact
  * brute-force top-k on the testdata (both SFs the gates run at) plus
  * wall time — the evidence behind knnIvfPq's scaladoc numbers and the
  * 0.6 gate floor's margin. */
object IvfPqProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ivfpqprobe] $name%-18s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 10)
      val bf = Similarity.knnBruteForce(emb, q, 5).select("query_id", "nn_id")
      val n = emb.count()
      for (residual <- Seq(false, true);
           nprobe <- Seq(8, 12, 16);
           rerank <- Seq(50, 100, 200, 400,
             Similarity.scaledRerank(n))) {
        val ann = Similarity.knnIvfPq(emb, q, 5, nprobe = nprobe,
          rerank = rerank, residual = residual)
        val hits = ann.select("query_id", "nn_id")
          .join(bf, Seq("query_id", "nn_id")).count()
        val nr = ann.count()
        println(s"[ivfpqprobe] $sf residual=$residual nprobe=$nprobe " +
          s"rerank=$rerank n_results=$nr recall@5=${hits / 50.0}")
      }
      // the shipped policy point (knnIvfPqAuto): what the gated query runs
      for (residual <- Seq(false, true)) {
        val cc = Similarity.scaledCells(n)
        val rr = Similarity.scaledRerank(n)
        val np = Similarity.scaledNprobe(n, cc, rr)
        val ann = Similarity.knnIvfPqAuto(emb, q, 5, residual = residual)
        val hits = ann.select("query_id", "nn_id")
          .join(bf, Seq("query_id", "nn_id")).count()
        println(s"[ivfpqprobe] $sf POLICY residual=$residual cells=$cc " +
          s"nprobe=$np rerank=$rr recall@5=${hits / 50.0}")
      }
    }
    spark.stop()
  }
}
