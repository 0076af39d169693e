package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md) plus the
  * reference-style text-directory source.
  *
  * The reference's only source is a directory of `.txt` files scanned as
  * lines (/root/reference/server.py:168-170, client.py:40-44). Spark's
  * `read.text` subsumes it: size-aware split packing replaces the
  * reference's locality-blind round-robin (server.py:121-124).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Normalize a timestamp column to TIMESTAMP (with-local-TZ) no matter
    * which physical parquet encoding the testdata generator picked:
    *   - INT64 TIMESTAMP(NANOS): sessions set
    *     spark.sql.legacy.parquet.nanosAsLong=true so it arrives as raw
    *     nanos (LongType); convert with integer division (ns ~1.7e18
    *     exceeds double's 2^53 mantissa, so never divide through floating
    *     point).
    *   - TIMESTAMP_MICROS with isAdjustedToUTC=0: Spark reads
    *     TIMESTAMP_NTZ; the session TZ is pinned UTC (build.sbt /
    *     SparkSession builders), so a cast to TimestampType reinterprets
    *     the same wall-clock instant value-exactly.
    *   - TIMESTAMP_MICROS/MILLIS adjusted to UTC: already TimestampType.
    * Downstream consumers (withWatermark, unix_micros) require plain
    * TIMESTAMP, so every events read — batch or streaming — must pass
    * through here. */
  private[graft] def normalizeTsColumn(df: DataFrame,
                                       tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTsColumn(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Reference O1: scan a directory of text files, one row per line.
    * (/root/reference/server.py:168-170 lists `*.txt`; client.py:44 reads
    * line-by-line.) Missing-dir tolerance is the caller's concern.
    */
  def textDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.textFile(s"$dir/*.txt").toDF("line")

  /** Missing-input tolerance, reference-exact: the reference skips
    * nonexistent inputs and yields empty output rather than failing
    * (client.py:41-42 `os.path.exists` skip; README.md:98 — surplus map
    * tasks receive `files=''` and do nothing). Spark's glob read throws
    * on an empty match instead, so probe first and return an empty
    * relation with the same schema. */
  def textDirTolerant(spark: SparkSession, dir: String): DataFrame = {
    val glob = new org.apache.hadoop.fs.Path(s"$dir/*.txt")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched =
      try Option(fs.globStatus(glob)).exists(_.nonEmpty)
      catch { case _: java.io.IOException => false }
    if (matched) textDir(spark, dir)
    else {
      import spark.implicits._
      spark.emptyDataset[String].toDF("line")
    }
  }
}
