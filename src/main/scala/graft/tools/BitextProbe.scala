package graft.tools
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Row counts + margin distribution of the bitext miner at each SF —
  * the evidence behind the query's margin floor — plus the ANN tier's
  * pair recall vs the exact tier, the evidence behind
  * [[graft.operators.Similarity.bitextAnnGate]]'s recall floor. */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      // ONE materialization of the quadratic exact tier: margin stats
      // and the pair frame both come off the same checkpointed
      // projection (r12 ADVICE — the second mineBitext call doubled
      // the probe's dominant cost)
      val m = Similarity.mineBitext(spark, dir)
        .select("src_id", "tgt_id", "margin_micros").localCheckpoint(true)
      val nExact = m.count()
      val st = m.agg(min("margin_micros"), max("margin_micros")).head()
      val tExact = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val ann = Similarity.mineBitextAnn(spark, dir)
        .select("src_id", "tgt_id").localCheckpoint(true)
      val nAnn = ann.count()
      val tAnn = (System.nanoTime() - t1) / 1e9
      val nHit = ann.join(m, Seq("src_id", "tgt_id"), "left_semi").count()
      val recall = if (nExact == 0) 1.0 else nHit.toDouble / nExact
      println(s"[bitext] $sf exact=$nExact " +
        s"margin=[${st.get(0)}, ${st.get(1)}] " +
        f"$tExact%.1f s | ann=$nAnn hit=$nHit recall=$recall%.3f " +
        f"$tAnn%.1f s")
    }
    spark.stop()
  }
}
