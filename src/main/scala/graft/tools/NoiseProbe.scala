package graft.tools

import graft.{GraftSession, SparkEntry}

/** Targeted variance probe for the recurring bench-noisy queries
  * (VERDICT r9 #3: dedup_minhash_pairs / dedup_simhash_pairs /
  * dedup_simhash_agreement landed in the noisy list in BOTH r8 and r9 —
  * two rounds running looks structural, not environmental). Runs each
  * suspect N times back-to-back under two configurations:
  *
  *   aqe   — the session default (AQE on, the bench's configuration);
  *   noaqe — spark.sql.adaptive.enabled=false, so every run executes
  *           the identical static plan.
  *
  * If the spread (max/min) collapses only when AQE is off, run-to-run
  * variance is AQE plan choice (runtime coalescing / join re-planning
  * picking differently across runs) and the fix is pinning partition
  * counts on the affected joins; if the spread persists with a static
  * plan, it is host noise and the `noisy` list is doing its job.
  * One JSON line per (query, config) with all timings.
  */
object NoiseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_minhash_pairs", "dedup_simhash_pairs",
        "dedup_simhash_agreement")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head) // warmup: session/codegen/footer-cache startup

    // INTERLEAVE the configs per repetition: the host's multi-minute
    // slow windows (SURVEY §6) would otherwise land on one config's
    // whole block and masquerade as a plan-choice effect — alternating
    // run-by-run exposes both configs to the same windows, so the
    // PAIRED ratio isolates AQE from the environment.
    val acc = scala.collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; name <- names; cfg <- Seq("aqe", "noaqe")) {
      spark.conf.set("spark.sql.adaptive.enabled", cfg == "aqe")
      acc((name, cfg)) :+= run(name)
    }
    def med(ts: Seq[Double]) = ts.sorted.apply(ts.size / 2)
    for (name <- names; cfg <- Seq("aqe", "noaqe")) {
      val ts = acc((name, cfg))
      println(f"""{"query":"$name","cfg":"$cfg","times":[${
        ts.map(t => f"$t%.3f").mkString(",")
      }],"spread":${ts.max / ts.min}%.2f,"median":${med(ts)}%.3f}""")
    }
    spark.conf.set("spark.sql.adaptive.enabled", true)
    spark.stop()
  }
}
