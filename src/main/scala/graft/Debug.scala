package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for plan inspection during development. */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ru = operators.Relational.rollupRevenue(spark, "/root/testdata/sf0.001")
    println("ROLLUP OK: " + ru.count())
    ru.show(8, false)
    spark.stop()
  }
}
