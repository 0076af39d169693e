package graft.tools
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Cross-SF evidence for the unigram trainer's gate flags (the oracle
  * pins them at 1 at every SF the driver replays). */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val row = TextAnalysis.unigramGate(spark, dir).head()
      val n = TextAnalysis.unigramTrainPieces(spark, dir).count()
      println(s"[unigram] $sf gate=$row pieces=$n " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
