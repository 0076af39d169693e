package graft

import graft.operators.{FuzzyMatch, Graph, Profile, Regression}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the round-6 third-wave operators: blocked fuzzy
  * matching (completeness of the length-band blocking), integer-exact
  * OLS (known closed forms, layout invariance), ordered-wedge triangle
  * counting (hand-counted graphs), and the integrity/decile audits over
  * the sf0.001 tables. */
class FuzzyRegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // --- FuzzyMatch -------------------------------------------------------

  test("fuzzy: finds pairs whose edit touches the FIRST char (no prefix blocking)") {
    val df = Seq("widget", "xidget", "stonework").toDF("v")
    val got = FuzzyMatch.similarPairs(df, "v", 2)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(got === Set(("widget", "xidget"))) // stonework is far away
  }

  test("fuzzy: length difference of exactly k crosses the bin boundary") {
    // "ab" (len 2, bin 1) vs "abcd" (len 4, bin 2): distance 2, found
    // only because the right side probes adjacent bins
    val df = Seq("ab", "abcd", "abcdefgh").toDF("v")
    val got = FuzzyMatch.similarPairs(df, "v", 2)
      .select("a", "b", "dist").as[(String, String, Int)].collect().toSet
    assert(got === Set(("ab", "abcd", 2)))
  }

  test("fuzzy: blocking is complete — matches the brute-force answer") {
    val vals = Seq("alpha", "alphas", "alpya", "beta", "betta", "bletta",
      "gamma", "gam", "gramma", "delta")
    val df = vals.toDF("v")
    val brute = (for {
      a <- vals; b <- vals if a < b
      d = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b).intValue
      if d <= 2
    } yield (a, b, d)).toSet
    val got = FuzzyMatch.similarPairs(df, "v", 2)
      .select("a", "b", "dist").as[(String, String, Int)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  // --- Regression -------------------------------------------------------

  test("ols: perfect line y = 3x + 2 gives an exactly proportional fraction") {
    val df = Seq((1L, 5L), (2L, 8L), (3L, 11L), (4L, 14L))
      .map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val r = Regression.olsByGroup(df, "grp", "x", "y")
      .select("n", "slope_num", "slope_den")
      .as[(Long, Long, Long)].collect().head
    assert(r._1 === 4L)
    assert(r._3 > 0L)
    assert(r._2 === 3L * r._3) // slope == exactly 3
  }

  test("ols: constant x surfaces as slope_den = 0, not a crash") {
    val df = Seq(("g", 7L, 1L), ("g", 7L, 9L)).toDF("grp", "x", "y")
    val r = Regression.olsByGroup(df, "grp", "x", "y")
      .select("slope_num", "slope_den").as[(Long, Long)].collect().head
    assert(r === ((0L, 0L)))
  }

  test("ols: result is partition-layout invariant (integer sums)") {
    val base = (1 to 500).map(i => ("g" + (i % 3), i.toLong, (i * 7 + 3).toLong))
    val a = Regression.olsByGroup(base.toDF("grp", "x", "y"), "grp", "x", "y")
      .orderBy("grp").collect().toSeq
    val b = Regression.olsByGroup(
        base.toDF("grp", "x", "y").repartition(17), "grp", "x", "y")
      .orderBy("grp").collect().toSeq
    assert(a === b)
  }

  // --- Triangle counting ------------------------------------------------

  test("triangles: K4 plus a dangling edge counts 4 triangles once each") {
    // K4 over {1,2,3,4} = 4 triangles; edge (4,5) closes nothing
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = Graph.triangleCount(edges)
      .as[(Long, Long, Long)].collect().head
    assert(r === ((5L, 7L, 4L)))
  }

  test("triangles: triangle-free bipartite-ish graph counts zero") {
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L)).toDF("a", "b")
    val r = Graph.triangleCount(edges)
      .as[(Long, Long, Long)].collect().head
    assert(r === ((4L, 4L, 0L)))
  }

  // --- Audits over sf0.001 ---------------------------------------------

  test("fk audit: every edge of the star schema is orphan-free") {
    val rows = Profile.fkIntegrityAudit(spark, dir)
      .select("edge", "n_child", "n_orphans", "n_orphan_keys")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === 8)
    assert(rows.forall(r => r._2 > 0L), "every child table is non-empty")
    assert(rows.forall(r => r._3 == 0L && r._4 == 0L),
      s"orphans found: ${rows.filter(_._3 != 0).mkString(",")}")
  }

  test("spend deciles: partition the customers, monotone boundaries") {
    val rows = Profile.spendDeciles(spark, dir)
      .select("decile", "n_customers", "lo_cents", "hi_cents", "sum_cents")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    val nCust = graft.sources.Tables.orders(spark, dir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum === nCust)
    // equi-depth: tile sizes differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // boundaries are non-overlapping and ordered
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"decile ${lo._1} hi > decile ${hi._1} lo")
    }
    assert(rows.forall(r => r._3 <= r._4))
  }

  // --- Wave 2: transitions, PMI, checksums ------------------------------

  test("event transitions: probabilities bounded, per-src counts consistent") {
    val rows = graft.operators.EventAnalytics.eventTransitions(spark, dir)
      .select("src", "dst", "cnt", "p_millionths")
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 > 0 && r._4 >= 0 && r._4 <= 1000000))
    // per src, sum of floor-divided millionths is within rowcount of 1e6
    rows.groupBy(_._1).foreach { case (srcName, rs) =>
      val s = rs.map(_._4).sum
      assert(s <= 1000000 && s > 1000000 - rs.length,
        s"src $srcName millionths sum $s out of range")
    }
  }

  test("collocations: scores non-increasing, minCount honored") {
    val rows = graft.operators.TextAnalysis.collocationsPmi(spark, dir)
      .select("cnt", "pmi_scaled").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_._1 >= 5))
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("table checksum: layout-invariant, order-invariant, mutation-sensitive") {
    val base = (1 to 200).map(i => (i.toLong, s"name_$i")).toDF("id", "nm")
    def sum(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Profile.tableChecksum(df, "t",
        Seq(col("id"), col("nm")))
        .select("n_rows", "xor56").as[(Long, Long)].collect().head
    val a = sum(base)
    val b = sum(base.repartition(13))
    val c = sum(base.orderBy(desc("id")))
    assert(a === b && a === c, "checksum depends on layout/order")
    val mutated = base.withColumn("nm",
      when(col("id") === 77L, lit("name_77x")).otherwise(col("nm")))
    assert(sum(mutated) !== a, "single-row mutation not detected")
    val empty = sum(base.filter(col("id") < 0L))
    assert(empty === ((0L, 0L)))
  }

  test("triangles: dense bitmap tier matches the wedge join exactly") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val bip = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L)).toDF("a", "b")
    val co = Graph.supplierCoEdges(spark, dir).localCheckpoint(true)
    for (g <- Seq(k4, bip, co)) {
      val sparse = Graph.triangleCount(g).collect().head
      val dense = Graph.triangleCountDense(g).collect().head
      assert(dense === sparse)
    }
    // sparse node-id space (non-contiguous ids must reindex correctly)
    val sparseIds = Seq((100L, 5000L), (100L, 999999L), (5000L, 999999L))
      .toDF("a", "b")
    assert(Graph.triangleCountDense(sparseIds).collect().head ===
      Graph.triangleCount(sparseIds).collect().head)
    // empty through the dense tier and the auto selector
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.triangleCountDense(none)
      .as[(Long, Long, Long)].collect().head === ((0L, 0L, 0L)))
    assert(Graph.triangleCountAuto(none)
      .as[(Long, Long, Long)].collect().head === ((0L, 0L, 0L)))
  }

  test("vocab coverage: monotone in k, bounded by total") {
    val rows = graft.operators.TextAnalysis.vocabCoverage(spark, dir)
      .select("k", "n_tokens", "covered", "coverage_millionths")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(100, 1000, 5000))
    assert(rows.forall(r => r._3 <= r._2 && r._4 <= 1000000L))
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "coverage must be monotone in k")
  }

  test("split leakage: partitions the corpus, detects a planted cross-split dup") {
    val base = graft.operators.Sampling.splitLeakageAudit(spark, dir)
      .as[(Long, Long, Long, Long)].collect().head
    val n = graft.sources.Tables.documents(spark, dir).count()
    assert(base._1 + base._2 === n, "split must partition the corpus")

    // plant one duplicate across the split: find a test-bucket id and a
    // train-bucket id with the same formula the operator uses
    def bucket(id: Long) = ((id % 2147483648L) * 2654435761L) % 100L
    val testId = (1L to 500L).find(bucket(_) < 10).get
    val trainId = (1L to 500L).find(bucket(_) >= 10).get
    val tmp = java.nio.file.Files.createTempDirectory("graft-leak").toString
    Seq((testId, "the shared document text", "en", "t", 23L),
        (trainId, "the shared document text", "en", "t", 23L),
        (trainId + 1000000L, "something else entirely", "en", "t", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val planted = graft.operators.Sampling.splitLeakageAudit(spark, tmp)
      .as[(Long, Long, Long, Long)].collect().head
    assert(planted._3 >= 1L && planted._4 >= 1L,
      s"planted cross-split duplicate not detected: $planted")
  }

  test("near-dup leakage: detects a planted cross-split near-duplicate") {
    // a NEAR-dup (one word dropped, J >> 0.5) crossing the split must be
    // caught by the LSH→exact tier while the exact-fp audit misses it
    def bucket(id: Long) = ((id % 2147483648L) * 2654435761L) % 100L
    val testId = (1L to 500L).find(bucket(_) < 10).get
    val trainId = (1L to 500L).find(bucket(_) >= 10).get
    val text = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi ") * 3
    val tmp = java.nio.file.Files.createTempDirectory("graft-nleak").toString
    val corpus = Seq((testId, text),
        (trainId, text.replaceFirst("alpha ", "")),
        (trainId + 100L, "unrelated text about completely other things"))
      .toDF("doc_id", "text")
    val r = graft.operators.Sampling.splitLeakageNearDup(corpus)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._3 >= 1L && r._4 >= 1L,
      s"planted cross-split near-dup not detected: $r")
    corpus
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val exact = graft.operators.Sampling.splitLeakageAudit(spark, tmp)
      .as[(Long, Long, Long, Long)].collect().head
    assert(exact._3 === 0L,
      "near-dup must be invisible to the exact-fingerprint tier")
  }
}
