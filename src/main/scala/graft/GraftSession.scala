package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the library: one place that encodes the
  * configuration the operators assume.
  *
  *  - AQE on: runtime partition coalescing and skew-join splitting are
  *    the first line of defense at 100 TB (SURVEY.md §4.2).
  *  - shuffle.partitions sized to the core count locally; on a real
  *    cluster callers override to ~2-3× total executor cores.
  *  - UTC session timezone: the DuckDB oracle and the timestamp test
  *    fixtures assume it.
  *  - nanosAsLong: the events table ships TIMESTAMP(NANOS), which the
  *    vectorized reader otherwise rejects (sources/Tables.events converts).
  *  - GraftExtensions: native expressions as SQL functions, the
  *    HOF→native dot-product rewrite rule, and the as-of join strategy.
  */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Ready-to-use local session (tests, notebooks, Bench/Verify). */
  def getOrCreate(): SparkSession = builder().getOrCreate()
}
