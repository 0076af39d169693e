package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = operators.Dedup.withNearDups(docs)
    val sigs = corpus.select(col("doc_id"), operators.Dedup.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val dists = (0L until 20L).map(i =>
      java.lang.Long.bitCount(sigs(i) ^ sigs(i + 10000L)))
    println("planted hamming dists=" + dists.sorted.mkString(","))
    spark.stop()
  }
}
