package graft.operators

import graft.functions.ZOrderExpression.interleave_bits
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: multi-dimensional clustering via Z-order.
  *
  * Writing 100 TB once and scanning it thousands of times makes layout
  * the highest-leverage optimization there is: range-partitioning by the
  * Morton code of (a, b) keeps BOTH a and b range-bounded within every
  * output file, so parquet min/max pruning serves predicates on either
  * column — a plain sort serves only its leading column. The operator
  * here is the write-side helper; the gated query hash-checks the
  * Morton arithmetic itself against a pure-SQL bit-twiddle oracle.
  */
object Layout {

  /** Range-partition by the Morton code of two integral columns —
    * the ZORDER BY (x, y) write path. One range exchange (sampled
    * bounds), no sort needed for pruning to work: per-partition min/max
    * of both columns is what the scan-side pruning reads. */
  def zorderRepartition(df: DataFrame, x: Column, y: Column,
                        numPartitions: Int): DataFrame =
    df.withColumn("__zorder", interleave_bits(x, y))
      .repartitionByRange(numPartitions, col("__zorder"))
      .drop("__zorder")

  /** Gated query: Morton code of (l_partkey, l_suppkey), bucketed by the
    * code's high bits; per-bucket count + bounding box of both keys.
    * Every value is integral, so the DuckDB oracle recomputes the
    * interleave bit-for-bit. The tight per-bucket boxes visible in the
    * result ARE the pruning story (LayoutSpec asserts it directly). */
  def zorderBucketStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey")
      .withColumn("z",
        interleave_bits(col("l_partkey"), col("l_suppkey")))
      .withColumn("bucket", expr("z DIV 65536"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("bucket")
}
