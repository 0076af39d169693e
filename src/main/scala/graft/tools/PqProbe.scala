package graft.tools
import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

object PqProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[pqprobe] $name%-18s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    val cb = t("train")(Similarity.pqTrain(emb))
    val pq = t("plan")(Similarity.knnPq(emb, q, 5))
    t("full run")(pq.write.format("noop").mode("overwrite").save())
    val bf = Similarity.knnBruteForce(emb, q, 5).select("query_id", "nn_id")
    val hits = pq.select("query_id","nn_id").join(bf, Seq("query_id", "nn_id")).count()
    println(s"[pqprobe] recall@5 = ${hits/50.0}")
    spark.stop()
  }
}
