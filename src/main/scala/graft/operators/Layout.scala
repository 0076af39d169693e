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

  /** Morton code over range-scaled dimensions: each column is affinely
    * mapped onto [0, 2^16) from its observed min/max (one tiny aggregate,
    * broadcast back as scalars) before interleaving. This is the fix for
    * the caveat above — interleaving RAW values of unequal-width
    * dimensions lets the wide one's high bits own every split and the
    * curve degenerates to a plain sort on it; after scaling, both
    * dimensions contribute alternating bits regardless of their units.
    * All integer arithmetic (`DIV`), so results hash exactly. */
  def scaledZ(df: DataFrame, x: String, y: String): DataFrame = {
    val bounds = df.agg(
      min(col(x)).as("xmin"), max(col(x)).as("xmax"),
      min(col(y)).as("ymin"), max(col(y)).as("ymax"))
    df.crossJoin(broadcast(bounds))
      .withColumn("zx",
        expr(s"(($x - xmin) * 65535) DIV greatest(xmax - xmin, 1)"))
      .withColumn("zy",
        expr(s"(($y - ymin) * 65535) DIV greatest(ymax - ymin, 1)"))
      .withColumn("z", interleave_bits(col("zx"), col("zy")))
  }

  /** Gated query: scaled Morton over (l_orderkey, l_partkey) — an
    * orderkey range ~30× wider than partkey's, exactly the case raw
    * interleaving mishandles. Bucketed by the top 8 interleaved bits
    * (4 per dimension): every bucket's bounding box must span ≲1/16 of
    * EACH key's range (asserted in LayoutSpec). */
  def zorderScaledStats(s: SparkSession, dir: String): DataFrame =
    scaledZ(Tables.lineitem(s, dir).select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey")
      .withColumn("bucket", expr("z DIV 16777216")) // 2^24: top 8 bits
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("l_orderkey").as("min_ord"), max("l_orderkey").as("max_ord"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
      .orderBy("bucket")

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
