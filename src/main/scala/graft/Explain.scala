package graft

/** Plan-audit helper: print the formatted plan of one SparkEntry query,
  * execute it through the noop sink, then print the final (AQE-resolved)
  * physical plan with runtime statistics baked in.
  *
  *   sbt "runMain graft.Explain dedup_simhash_pairs /root/testdata/sf0.1"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <query> [sfDir]; known: ${
      SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"=== $name: optimized plan (pre-execution) ===")
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"=== executed in ${(System.nanoTime() - t0) / 1e9}%.2f s; " +
      "final adaptive plan ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
