package graft.tools
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Row counts + margin distribution of the bitext miner at each SF —
  * the evidence behind the query's margin floor. */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val m = Similarity.mineBitext(spark, dir)
      val st = m.agg(count(lit(1)), min("margin_micros"),
        max("margin_micros")).head()
      println(s"[bitext] $sf rows=${st.getLong(0)} " +
        s"margin=[${st.get(1)}, ${st.get(2)}] " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
