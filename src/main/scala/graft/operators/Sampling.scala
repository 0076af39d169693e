package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * At 100 TB, `df.sample()` is the wrong tool for corpus curation: its
  * output changes with partition layout and Spark version, so a pipeline
  * re-run selects a different corpus. Both operators here key the decision
  * on the *data* (a multiplicative hash of a stable id), making the sample
  * reproducible across runs, engines (same arithmetic runs in the DuckDB
  * oracle), cluster sizes, and file splits — and embarrassingly parallel:
  * the Bernoulli sampler is a pure per-row filter fused into the scan
  * (no shuffle), the stratified sampler shuffles once on the stratum key.
  */
object Sampling {

  /** Knuth's multiplicative-hash constant (2^32 / phi, public domain). */
  private val Mult = 2654435761L

  /** Deterministic pseudo-random bucket in [0, 100) from a stable id.
    * Plain int64 arithmetic (no engine-specific hash), so the identical
    * expression runs under ANSI mode and in ANSI SQL oracles. The id is
    * folded into [0, 2^31) BEFORE the multiply: 2^31 · Mult ≈ 5.7e18
    * stays below 2^63, so the product never overflows — without the fold,
    * ids above ~3.4e9 would wrap in non-ANSI engines and *raise* in ANSI
    * Spark/DuckDB, breaking engine-independence exactly at large-corpus
    * scale. */
  def hashBucket(id: Column): Column =
    pmod(pmod(id, lit(1L << 31)) * lit(Mult), lit(100L))

  /** Keep ~pct% of rows, decided per-row from `idCol` — a scan-fused
    * filter with zero shuffle. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** At most `perStratum` rows per stratum, chosen in deterministic
    * hash-then-id order (not "first seen", which is layout-dependent).
    * One shuffle on the stratum key; the per-group top-k is a single
    * window pass. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** 20% deterministic document sample with per-doc bucket shown. */
  def documentsSample(s: SparkSession, dir: String): DataFrame =
    hashSample(Tables.documents(s, dir), "doc_id", 20)
      .select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"),
        col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** 10 docs per language, deterministic across runs and layouts. */
  def documentsStratified(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(s, dir), "lang", "doc_id", 10)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("lang", "doc_id")

  /** Mixture sampling — the data-mixing knob every multi-source training
    * corpus needs: a per-stratum keep RATE (not a per-stratum quota like
    * [[stratifiedSample]]), so sources are re-weighted while the decision
    * stays a pure per-row hash filter — scan-fused, zero shuffles, and
    * reproducible across layouts exactly like [[hashSample]]. The rate
    * lookup compiles to a literal CASE chain (#strata is small by
    * definition), never a join. */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                    rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, pct)) =>
        when(col(stratumCol) === k, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** English-heavy corpus rebalanced: keep 90% en, 40% zh, 60% rest. */
  def documentsMixture(s: SparkSession, dir: String): DataFrame =
    mixtureSample(Tables.documents(s, dir), "lang", "doc_id",
        Map("en" -> 90, "zh" -> 40), defaultPct = 60)
      .select(col("doc_id"), col("lang"),
        hashBucket(col("doc_id")).as("bucket"))
      .orderBy("doc_id")

  /** Train/test split leakage audit: hash-split the corpus (same
    * deterministic bucket as [[hashSample]] — membership is a pure
    * function of doc_id, never of layout), then count exact-content
    * collisions ACROSS the split: the eval-integrity gate every
    * training pipeline runs before trusting a held-out score, because a
    * test document whose exact duplicate sits in train measures
    * memorization, not generalization.
    *
    * One scan computes fingerprint + bucket; the cross-split join runs
    * hash-partitioned on the md5 fingerprint (content-uniform, no skew
    * beyond true duplicate mass). Near-dup leakage is the same audit
    * with the LSH candidate tier upstream (see nearDupPipeline) — this
    * query gates the exact tier, whose zero-false-positive answer is
    * SQL-recomputable. */
  def splitLeakageAudit(s: SparkSession, dir: String,
                        testPct: Int = 10): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        hashBucket(col("doc_id")).as("b"))
    val test = docs.filter(col("b") < testPct)
      .select(col("doc_id").as("test_id"), col("fp"))
    val train = docs.filter(col("b") >= testPct)
      .select(col("doc_id").as("train_id"), col("fp"))
    val leaks = test.join(train, "fp")
    test.agg(count(lit(1)).as("n_test"))
      .crossJoin(train.agg(count(lit(1)).as("n_train")))
      .crossJoin(leaks.agg(count(lit(1)).as("n_leak_pairs"),
        countDistinct("test_id").as("n_leaky_test_docs")))
      .select(col("n_train"), col("n_test"), col("n_leak_pairs"),
        col("n_leaky_test_docs"))
  }
}
