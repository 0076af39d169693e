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
}
