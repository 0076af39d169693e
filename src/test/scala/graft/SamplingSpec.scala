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
}
