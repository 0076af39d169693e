package graft

import graft.functions.ZOrderExpression.{interleave_bits, ZOrderCodec}
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Bit-by-bit reference: place bit i of x at 2i, bit i of y at 2i+1. */
  private def slowMorton(x: Long, y: Long): Long = {
    var out = 0L
    for (i <- 0 until 32) {
      out |= ((x >>> i) & 1L) << (2 * i)
      out |= ((y >>> i) & 1L) << (2 * i + 1)
    }
    out
  }

  test("codec matches the bit-by-bit reference on random inputs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrderCodec.interleave(x, y) === slowMorton(x, y),
        s"($x, $y)")
    }
    assert(ZOrderCodec.interleave(3, 0) === 5L)
    assert(ZOrderCodec.interleave(0, 3) === 10L)
    assert(ZOrderCodec.interleave(5, 9) === 147L)
  }

  test("expression agrees with the codec; codegen == interpreted") {
    val df = Seq((3L, 0L), (0L, 3L), (5L, 9L), (123456L, 654321L))
      .toDF("x", "y")
    def run(mode: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(interleave_bits(col("x"), col("y"))).as[Long]
        .collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    assert(cg === run("NO_CODEGEN"))
    assert(cg === Seq((3L, 0L), (0L, 3L), (5L, 9L), (123456L, 654321L))
      .map { case (x, y) => ZOrderCodec.interleave(x, y) })
  }

  test("null-propagating; int inputs ok") {
    val df = Seq((Some(5), Some(9)), (None, Some(9)))
      .toDF("x", "y")
    val got = df.select(interleave_bits(col("x"), col("y")))
      .collect()
    assert(got(0).getLong(0) === 147L) // IntegerType children work too
    assert(got(1).isNullAt(0))
  }

  test("z-order bounds BOTH dimensions per partition; a sort bounds one") {
    // 64x64 grid: every (x, y) pair once
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")

    def maxYSpan(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("y") - min("y")).as("span"))
        .agg(max("span")).as[Long].collect().head

    val zSpan = maxYSpan(
      Layout.zorderRepartition(grid, col("x"), col("y"), 8))
    val xSpan = maxYSpan(grid.repartitionByRange(8, col("x")))
    // x-range partitioning leaves y unbounded (full 0..63 span in every
    // partition); z-order's 8 ranges cut the grid into blocks bounded
    // in BOTH dimensions
    assert(xSpan === 63L)
    assert(zSpan <= 32L, s"z-order y-span $zSpan")
  }

  test("scaled z-order bounds BOTH unequal-width dims per bucket") {
    // orderkey range is ~30x partkey's at every sf; after scaling, the
    // top 8 interleaved bits give 4 bits per dim → every bucket spans
    // <= 1/16 of each range (+1 scaling quantum)
    val stats = Layout.zorderScaledStats(spark, "/root/testdata/sf0.01")
      .collect()
    assert(stats.length > 16)
    val gOrd = stats.map(_.getLong(3)).max - stats.map(_.getLong(2)).min
    val gPart = stats.map(_.getLong(5)).max - stats.map(_.getLong(4)).min
    stats.foreach { r =>
      val ordSpan = r.getLong(3) - r.getLong(2)
      val partSpan = r.getLong(5) - r.getLong(4)
      assert(ordSpan <= gOrd / 16 + gOrd / 65535 + 1,
        s"bucket ${r.getLong(0)} ord-span $ordSpan of $gOrd")
      assert(partSpan <= gPart / 16 + gPart / 65535 + 1,
        s"bucket ${r.getLong(0)} part-span $partSpan of $gPart")
    }
  }

  test("z-ordered parquet prunes row groups for second-dim predicates") {
    // end-to-end: write the same rows in two layouts with tiny row
    // groups, filter on the SECOND dimension only, and compare how many
    // rows parquet's min/max row-group pruning lets through the scan
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder")
      .toString
    val grid = (for { x <- 0 until 256; y <- 0 until 256 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val rg = Map("parquet.block.size" -> "65536",
      "parquet.page.size" -> "8192")
    Layout.zorderRepartition(grid, col("x"), col("y"), 1)
      .withColumn("z", interleave_bits(col("x"), col("y")))
      .sortWithinPartitions("z").drop("z")
      .write.options(rg).mode("overwrite").parquet(s"$tmp/zorder")
    grid.repartition(1).sortWithinPartitions("x")
      .write.options(rg).mode("overwrite").parquet(s"$tmp/xsort")

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("y") === 7)
      df.collect() // run the scan so metrics populate
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val ns = plan.collect {
        case l: org.apache.spark.sql.execution.LeafExecNode
          if l.metrics.contains("numOutputRows") =>
          l.metrics("numOutputRows").value
      }
      assert(ns.nonEmpty, s"no scan metric in:\n$plan")
      ns.head
    }
    val zRows = scannedRows(s"$tmp/zorder")
    val xRows = scannedRows(s"$tmp/xsort")
    // correctness identical...
    assert(spark.read.parquet(s"$tmp/zorder").filter(col("y") === 7)
      .count() === 256)
    // ...but the x-sorted layout has y spanning 0..255 in EVERY row
    // group (no pruning: full 64k rows surface), while z-order bounds y
    // per row group and the scan skips most of the file
    assert(xRows === 65536L, s"x-sort scanned $xRows")
    assert(zRows < 65536L / 2, s"z-order scanned $zRows, want < 32768")
  }

  test("zorderBucketStats boxes are tight: bucket spans both keys") {
    // sf0.01: partkey <= 1999, so buckets (z DIV 2^16) fix partkey's
    // bits >= 8 — every bucket's part-span is < 256 against a ~2000
    // global range
    val stats = Layout.zorderBucketStats(spark, "/root/testdata/sf0.01")
      .collect()
    assert(stats.length > 1)
    val gMaxPart = stats.map(_.getLong(3)).max
    stats.foreach { r =>
      val partSpan = r.getLong(3) - r.getLong(2)
      assert(partSpan < 256,
        s"bucket ${r.getLong(0)} part-span $partSpan vs global $gMaxPart")
    }
  }
}
