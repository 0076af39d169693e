package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted plan and a sample of one named query.
  * Usage: runMain graft.Debug <queryName> [sfDir]
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "wordcount_ci"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    df.show(20, truncate = false)
    spark.stop()
  }
}
