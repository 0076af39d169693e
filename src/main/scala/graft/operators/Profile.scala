package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling — the "look before you train" audit every corpus
  * ingest runs first: per-column row/null/distinct counts and min/max.
  *
  * Shape: one aggregate per column, unioned. Each leg's scan is
  * column-pruned to exactly its column (ReadSchema shows one field), so
  * the union costs one pass over each column's pages — not N passes
  * over the table. Exact `countDistinct` is a per-column shuffle; at
  * 100 TB swap in `approx_count_distinct` (the HLL++ sketch tier,
  * `approx_lineitem_stats`) — the plan shape is otherwise identical.
  * min/max aggregate on the NATIVE type (numeric order for numerics),
  * then cast to string only for the uniform report schema. */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        // coalesce: sum() over zero rows is NULL — an empty table has
        // zero nulls, not an unknown number of them
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_v"),
        max(col(c)).cast("string").as("max_v"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionAll _).orderBy("col_name")

  /** Gated query: profile of the documents table. */
  def documentsProfile(s: SparkSession, dir: String): DataFrame =
    columnProfile(Tables.documents(s, dir),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  /** Fixed-width histogram of a monetary column — the distribution view
    * next to the profile. Bucketing runs on integer cents with integer
    * division against broadcast min/max scalars, so bucket boundaries
    * are bit-exact on every engine (a float `floor((x-min)/w)` flips at
    * representation boundaries). Two passes: the tiny bounds aggregate,
    * then one scan + one bucket-count shuffle. */
  def priceHistogram(s: SparkSession, dir: String,
                     nBuckets: Int = 32): DataFrame = {
    val cents = Tables.lineitem(s, dir).select(
      round(col("l_extendedprice") * 100d, 0).cast("long").as("cents"))
    val bounds = cents.agg(min("cents").as("cmin"), max("cents").as("cmax"))
    cents.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(
        s"least((cents - cmin) * $nBuckets DIV " +
          s"greatest(cmax - cmin + 1, 1), ${nBuckets - 1})"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("cents").as("lo_cents"), max("cents").as("hi_cents"))
      .orderBy("bucket")
  }
}
