package graft

/** Plan-audit helper: print the formatted plan of one SparkEntry query,
  * execute THAT DataFrame's QueryExecution, then print its final
  * (AQE-resolved) physical plan with runtime statistics baked in.
  *
  *   sbt "runMain graft.Explain dedup_simhash_pairs /root/testdata/sf0.1"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    def usage = s"usage: Explain <query> [sfDir]; known: ${
      SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"
    require(args.nonEmpty, usage)
    val name = args(0)
    require(SparkEntry.queries.contains(name), s"unknown query '$name'\n$usage")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"=== $name: optimized plan (pre-execution) ===")
    df.explain("formatted")
    // execute this df's OWN QueryExecution (a write.save() would plan a
    // fresh one, leaving df.queryExecution.executedPlan unexecuted and
    // isFinalPlan=false): toRdd + a noop action finalizes AQE in place
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.foreachPartition(_ => ())
    println(f"=== executed in ${(System.nanoTime() - t0) / 1e9}%.2f s; " +
      "final adaptive plan ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
