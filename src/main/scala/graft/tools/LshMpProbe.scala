package graft.tools
import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Plain vs multi-probe LSH recall@5 against the exact tier — the
  * evidence behind knnLsh's multiProbe scaladoc and the lsh_mp gate
  * row's margin over the 0.6 floor. */
object LshMpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 10)
      val bf = Similarity.knnBruteForce(emb, q, 5).select("query_id", "nn_id")
      for (mp <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val ann = Similarity.knnLsh(emb, q, 5, multiProbe = mp)
        val hits = ann.select("query_id", "nn_id")
          .join(bf, Seq("query_id", "nn_id")).count()
        println(f"[lshmp] $sf mp=$mp recall@5=${hits / 50.0} " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
