package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Determinism and layout-independence of the hash samplers — the whole
  * point of keying sampling on data rather than on partition randomness. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = (0L until 1000L).toDF("id")
    .withColumn("grp", (col("id") % 7).cast("string"))

  test("hashSample is deterministic and layout-independent") {
    val a = Sampling.hashSample(df, "id", 20).select("id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(13), "id", 20).select("id")
      .as[Long].collect().toSet
    assert(a === b)
    // ~20% within loose tolerance (hash, not exact quota)
    assert(a.size > 120 && a.size < 280, s"got ${a.size}")
  }

  test("stratifiedSample takes an exact per-stratum quota, stably") {
    val s1 = Sampling.stratifiedSample(df, "grp", "id", 5)
    val s2 = Sampling.stratifiedSample(df.repartition(17), "grp", "id", 5)
    val counts = s1.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L))
    assert(s1.select("id").as[Long].collect().toSet ===
           s2.select("id").as[Long].collect().toSet)
  }

  test("mixtureSample applies per-stratum rates, layout-independent") {
    val rates = Map("0" -> 90, "1" -> 10)
    val m1 = Sampling.mixtureSample(df, "grp", "id", rates, defaultPct = 50)
    val m2 = Sampling.mixtureSample(df.repartition(11), "grp", "id",
      rates, defaultPct = 50)
    assert(m1.select("id").as[Long].collect().toSet ===
           m2.select("id").as[Long].collect().toSet)
    val kept = m1.groupBy("grp").count().as[(String, Long)].collect().toMap
    val tot = df.groupBy("grp").count().as[(String, Long)].collect().toMap
    // rate ordering must hold with real margins: 90% > 50% > 10%
    def frac(g: String) = kept.getOrElse(g, 0L).toDouble / tot(g)
    assert(frac("0") > 0.75, s"grp0 ${frac("0")}")
    assert(frac("1") < 0.25, s"grp1 ${frac("1")}")
    assert(frac("2") > 0.3 && frac("2") < 0.7, s"grp2 ${frac("2")}")
  }

  test("trainingShards is an exact layout-independent permutation") {
    val s1 = Sampling.trainingShards(df, "id", 8)
    val s2 = Sampling.trainingShards(df.repartition(17), "id", 8)
    // byte-identical shard layout regardless of input partitioning
    assert(s1.collect().map(_.toSeq).toSet ===
           s2.collect().map(_.toSeq).toSet)
    val rows = s1.select("id", "shard", "pos")
      .as[(Long, Long, Int)].collect()
    // every doc exactly once
    assert(rows.map(_._1).toSet === (0L until 1000L).toSet)
    // positions are contiguous 1..n within every shard (a trainer can
    // stream a shard as a dense file)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.size),
        s"shard $shard positions not contiguous")
    }
    // multiplicative hash balances shards without a balancing pass
    val sizes = rows.groupBy(_._2).values.map(_.size)
    assert(sizes.max - sizes.min < 100,
      s"shard imbalance: min=${sizes.min} max=${sizes.max}")
    // within a shard, pos order must NOT be id order (it's a shuffle)
    val firstShard = rows.filter(_._2 == rows.head._2).sortBy(_._3).map(_._1)
    assert(firstShard.toSeq !== firstShard.sorted.toSeq)
  }

  test("mixtureBudget meets per-source token targets via epochs + remainder") {
    val dir = "/root/testdata/sf0.001"
    val out = Sampling.mixtureBudget(SparkTestSession.spark, dir,
        Map("en" -> 500000L, "zh" -> 150000L), defaultWeight = 100000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(8))).toSeq
    assert(out.nonEmpty)
    out.foreach { case (lang, avail, target, epochs, rate, achieved) =>
      // decomposition invariant: epochs·avail ≤ target < (epochs+1)·avail
      assert(epochs * avail <= target && target < (epochs + 1) * avail,
        s"$lang epochs decomposition")
      assert(rate >= 0 && rate < 1000000, s"$lang rate $rate")
      // achieved tracks target within sampling noise of a small stratum
      // (each doc is ~0.5-3% of its stratum at sf0.001)
      assert(math.abs(achieved - target) <= math.max(target / 4, 200L),
        s"$lang achieved=$achieved vs target=$target")
    }
  }

  test("shardManifest partitions the corpus with stable nonzero checksums") {
    val dir = "/root/testdata/sf0.001"
    val m = Sampling.shardManifest(SparkTestSession.spark, dir, 8).collect()
    assert(m.length === 8)
    assert(m.map(_.getLong(1)).sum === 500L) // shards partition the corpus
    m.foreach(r => assert(r.getLong(3) <= r.getLong(4), "id range"))
    // 56-bit xor checksums of distinct doc sets: non-zero and distinct
    // (a collision would be astronomically unlikely)
    val xs = m.map(_.getLong(5))
    assert(xs.distinct.length === xs.length && xs.forall(_ != 0L))
    // deterministic across runs
    val m2 = Sampling.shardManifest(SparkTestSession.spark, dir, 8).collect()
    assert(m.map(_.toString).toSeq === m2.map(_.toString).toSeq)
  }

  test("temperatureMixtureBudget delivers the derived weights' targets") {
    val dir = "/root/testdata/sf0.001"
    // the standalone weight table is the reference for the composition
    val w = Sampling.temperatureWeights(SparkTestSession.spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val out = Sampling.temperatureMixtureBudget(SparkTestSession.spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(8)))
    assert(out.nonEmpty && out.size === w.size)
    val budget = out.map(_._2).sum / 2
    out.foreach { case (lang, avail, target, epochs, rate, achieved) =>
      // the composed target is exactly budget·w/1e6 for the DERIVED w
      val expected = (budget / 1000000L) * w(lang) +
        ((budget % 1000000L) * w(lang)) / 1000000L
      assert(target === expected, s"$lang target=$target expected=$expected")
      assert(epochs * avail <= target && target < (epochs + 1) * avail,
        s"$lang epochs decomposition")
      assert(rate >= 0 && rate < 1000000, s"$lang rate $rate")
      assert(math.abs(achieved - target) <= math.max(target / 4, 200L),
        s"$lang achieved=$achieved vs target=$target")
    }
  }

  test("temperatureWeights flattens shares toward uniform, exactly at a=1") {
    val dir = "/root/testdata/sf0.001"
    def rows(alphaM: Long) =
      Sampling.temperatureWeights(SparkTestSession.spark, dir, alphaM)
        .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
        .toSeq // (lang, share_millionths, temp_weight_millionths)
    val half = rows(500000L)
    assert(half.size >= 3)
    // weights are a normalized distribution (floor slack ≤ #langs ppm)
    val wsum = half.map(_._3).sum
    assert(wsum <= 1000000L && wsum >= 1000000L - half.size,
      s"weight sum $wsum")
    // order-preserving: a larger share never gets a smaller weight
    for (a <- half; b <- half if a._2 < b._2)
      assert(a._3 <= b._3, s"order violated: $a vs $b")
    // flattening: the boost w/share strictly favors the smaller share
    // (cross-multiplied to stay in integers; +2 absorbs floor jitter)
    for (a <- half; b <- half if a._2 < b._2)
      assert((a._3 + 2) * b._2 >= b._3 * a._2,
        s"smaller share not boosted: $a vs $b")
    // a = 1 degenerates to the natural shares (up to normalization of
    // the floored share vector: shares sum to ≤ 1e6, weights re-scale
    // by 1e6/sum — a few-ppm drift at most)
    val one = rows(1000000L)
    one.foreach { case (lang, share, w) =>
      assert(math.abs(w - share) <= 10L, s"$lang a=1: w=$w share=$share")
    }
    // a -> 0 approaches uniform regardless of share spread
    val flat = rows(1000L)
    val ws = flat.map(_._3)
    assert(ws.max - ws.min <= 2000L, s"near-uniform expected: $flat")
  }

  test("weighted sample: deterministic, k rows, length-biased") {
    import graft.operators.Sampling
    val dir = "/root/testdata/sf0.001"
    val a = Sampling.weightedSample(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    val b = Sampling.weightedSample(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 100)
    // A-Res with w = n_toks: the sample's mean length must exceed the
    // corpus mean (inclusion probability rises with weight)
    val corpusMean = graft.sources.Tables.documents(spark, dir)
      .select(avg(size(graft.functions.TextFunctions
        .tokenize(col("text"))))).as[Double].head()
    val sampleMean = a.map(_._3).sum.toDouble / a.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("domain cap: every source capped, draw is the hash order") {
    import graft.operators.{Curation, Sampling}
    val dir = "/root/testdata/sf0.001"
    val kept = Curation.domainCap(spark, dir, cap = 10)
      .as[(Long, String, Long)].collect()
    val bySrc = kept.groupBy(_._2)
    // testdata sources hold 25 docs each -> the cap binds exactly
    assert(bySrc.values.forall(_.length === 10))
    // the survivors are the 10 smallest hash keys of their source
    val hkeys = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        Sampling.hashOrderKey(col("doc_id")).as("h"))
      .as[(Long, String, Long)].collect()
    for ((src, rows) <- bySrc) {
      val expect = hkeys.filter(_._2 == src).sortBy(r => (r._3, r._1))
        .take(10).map(_._1).toSet
      assert(rows.map(_._1).toSet === expect, s"wrong draw for $src")
    }
  }
}
