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

  /** Knuth's multiplicative-hash constant (2^32 / phi, public domain).
    * PUBLIC because SparkEntry interpolates it into the DuckDB oracle
    * SQL — one definition drives both engines' hash arithmetic (the
    * ShardN anti-desync pattern; ADVICE r9 flagged the hardcoded
    * copies). */
  val Mult = 2654435761L

  /** Fold modulus 2^31 — ids are folded into [0, Fold) before the
    * multiply so the product stays below 2^63 (see [[hashBucket]]).
    * Shared with the oracles for the same anti-desync reason. */
  val Fold = 1L << 31

  /** Deterministic pseudo-random bucket in [0, 100) from a stable id.
    * Plain int64 arithmetic (no engine-specific hash), so the identical
    * expression runs under ANSI mode and in ANSI SQL oracles. The id is
    * folded into [0, 2^31) BEFORE the multiply: 2^31 · Mult ≈ 5.7e18
    * stays below 2^63, so the product never overflows — without the fold,
    * ids above ~3.4e9 would wrap in non-ANSI engines and *raise* in ANSI
    * Spark/DuckDB, breaking engine-independence exactly at large-corpus
    * scale. */
  def hashBucket(id: Column): Column =
    pmod(pmod(id, lit(Fold)) * lit(Mult), lit(100L))

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

  /** 10 docs per language, deterministic across runs and layouts. */
  def documentsStratified(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(s, dir), "lang", "doc_id", 10)
      .select(col("doc_id"), col("lang"), col("n_chars"))

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

  /** Full-range deterministic order key in [0, 2^31) — the "global
    * shuffle" position source for shard assignment. Same fold-then-
    * multiply as [[hashBucket]] (and the same overflow guard) but keeps
    * all 31 bits instead of collapsing to 100 buckets, so it totally
    * orders a corpus with negligible collision mass. */
  def hashOrderKey(id: Column): Column =
    pmod(pmod(id, lit(Fold)) * lit(Mult), lit(Fold))

  /** Shard from the HIGH bits of [[hashOrderKey]]: range-slice [0, 2^31)
    * into nShards equal intervals, i.e. `(hkey·nShards) DIV 2^31`.
    * The low bits of a multiplicative hash are NOT hash-random: Mult ≡ 1
    * (mod 16), so `hkey % 16 == id % 16` exactly and any power-of-two
    * modulus reduces to a fixed permutation of `id mod nShards` — id
    * spaces with stride divisible by nShards (planted-twin offsets,
    * copy strides) would collapse every copy into its base doc's shard.
    * The high bits are the textbook output of Knuth's method (three-
    * distance equidistribution), and the range-slice form works for any
    * nShards, not just powers of two. hkey < 2^31 and nShards is small,
    * so the product stays far below 2^63. */
  def shardOf(hkey: Column, nShards: Int): Column =
    shiftright(hkey * lit(nShards.toLong), 31)

  /** Millionth-resolution deterministic bucket in [0, 1e6) — the rate
    * knob for [[mixtureBudget]], where 1-in-100 granularity is too
    * coarse to hit a token budget. */
  def bucketMillionths(id: Column): Column =
    pmod(pmod(id, lit(Fold)) * lit(Mult), lit(1000000L))

  /** Deterministic global shuffle into training shards — the step that
    * turns a curated corpus into the shard files a trainer streams:
    * every doc gets a (shard, pos) such that reading shards in pos
    * order is a pseudo-random permutation of the corpus.
    *
    * Scale shape: shard assignment is a pure per-row hash (scan-fused,
    * zero shuffle); only the within-shard position needs data movement
    * — ONE shuffle on the shard key and a per-shard sort, which is
    * embarrassingly parallel across shards (at 100 TB you run
    * thousands of shards, so a shard is a few GB and the sort is
    * in-memory per task). Never a global row_number — a single-
    * partition window is the non-scalable version of this operator.
    * Determinism: (hkey, id) is a total order on docs independent of
    * layout, cluster size, or engine — re-runs produce byte-identical
    * shards. */
  def trainingShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("hkey"), col(idCol))
    df.select(col(idCol), hashOrderKey(col(idCol)).as("hkey"))
      .withColumn("shard", shardOf(col("hkey"), nShards))
      .withColumn("pos", row_number().over(w))
  }

  /** Per-doc shard assignment for the documents table. */
  def documentsShards(s: SparkSession, dir: String,
                      nShards: Int = 16): DataFrame =
    trainingShards(Tables.documents(s, dir), "doc_id", nShards)
      .select(col("doc_id"), col("shard"), col("pos"), col("hkey"))

  /** Per-shard doc/token totals — the balance audit for
    * [[documentsShards]] (a trainer wants near-equal shard sizes; the
    * multiplicative hash delivers them without any balancing pass).
    * One scan + one tiny aggregate, no window. */
  def shardStats(s: SparkSession, dir: String,
                 nShards: Int = 16): DataFrame =
    Tables.documents(s, dir)
      .select(shardOf(hashOrderKey(col("doc_id")), nShards).as("shard"),
        size(graft.functions.TextFunctions.tokenize(col("text")))
          .as("n_toks"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("shard_toks"))
      .orderBy("shard")

  /** Per-shard delivery manifest — what a trainer (or the next
    * pipeline stage) verifies before streaming shards: per shard, doc
    * and token counts, the id range, and an ORDER-INDEPENDENT content
    * checksum (bit_xor of a 56-bit md5 fold over id|text — xor
    * commutes, so the checksum is stable under any read order or
    * partition layout, and never overflows the way a sum of folds
    * would under ANSI arithmetic). One scan, one shard-keyed
    * aggregation — the manifest costs a single pass regardless of
    * shard count, and a re-delivered corpus diff reduces to comparing
    * two nShards-row tables. */
  def shardManifest(s: SparkSession, dir: String,
                    nShards: Int = 16): DataFrame =
    Tables.documents(s, dir)
      .select(shardOf(hashOrderKey(col("doc_id")), nShards).as("shard"),
        col("doc_id"),
        size(graft.functions.TextFunctions.tokenize(col("text")))
          .cast("long").as("n_toks"),
        expr("cast(conv(substr(md5(concat_ws('|', doc_id, text)), 1, 14)" +
          ", 16, 10) as bigint)").as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("shard_toks"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("content_xor56"))
      .orderBy("shard")

  /** α for [[temperatureWeights]], in millionths (0.5 — "T=2"
    * flattening). PUBLIC and integer so the oracle SQL interpolates the
    * same constant and both engines derive the double by the identical
    * division (the ShardN anti-desync pattern). */
  val TempAlphaMillionths = 500000L

  /** Temperature-flattened mixture weights — the multilingual
    * α-sampling re-weighting (natural share p_i → p_i^α / Σ p_j^α,
    * α ∈ (0,1]): at α = 1 weights equal natural shares, at α → 0 they
    * approach uniform, and in between low-resource sources get boosted
    * relative to their share — the standard multilingual-pretraining
    * trick for keeping small languages from washing out of the
    * mixture. Emits the langs-sized weight table the mixture knobs
    * ([[mixtureSample]], [[mixtureBudget]]) consume.
    *
    * Plan shape: ONE map-side-combined token-count aggregate over the
    * corpus — the corpus scans exactly once (PlanSpec pins it);
    * everything downstream is arithmetic on the langs-sized aggregate
    * output, with the two totals (token mass, weight normalizer) as
    * UNPARTITIONED windows over that frame — a single-partition window
    * is exactly right for a dozens-of-rows frame, and keeps the whole
    * operator one lazy plan (separate total aggregates re-expanded the
    * corpus subtree once per consumer — 4 scans before this shape).
    * Floating point enters EXACTLY once per lang:
    * u = floor(1e6·exp(α·ln(share_millionths))), computed from the
    * already-integer share (the (1e6)^α scale factor cancels in the
    * normalization, so sharing the integer input with the oracle
    * removes every other engine-divergence surface; a 1-ulp exp
    * disagreement flips the floor only when the true value sits within
    * ~1e-7 millionths of an integer). Normalization is then pure
    * int64. The share computation carries [[mixtureBudget]]'s overflow
    * discipline — never multiply a 100 TB token count by 1e6.
    * Sub-ppm shares clamp to 1 before the ln (Spark yields null and
    * DuckDB -inf on ln(0) — differently degenerate), so a < 1-ppm
    * source rounds to the smallest boost instead of vanishing. */
  def temperatureWeights(s: SparkSession, dir: String,
                         alphaMillionths: Long = TempAlphaMillionths)
      : DataFrame =
    withTempWeight(availByLang(tokCountedDocs(s, dir)), alphaMillionths)
      .select(col("lang"), col("n_docs"), col("available_toks"),
        col("share_millionths"), col("temp_weight_millionths"))
      .orderBy("lang")

  /** The langs-sized temperature computation, appended as columns to a
    * per-lang (…, available_toks, …) aggregate — shared by
    * [[temperatureWeights]] and [[temperatureMixtureBudget]]. */
  private def withTempWeight(avail: DataFrame,
                             alphaMillionths: Long): DataFrame = {
    val alpha = lit(alphaMillionths.toDouble / 1000000.0)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    avail
      .withColumn("total_toks", sum("available_toks").over(all))
      .withColumn("share_millionths", expr(
        s"""CASE WHEN total_toks < ${1L << 43}
           |  THEN (available_toks * 1000000) DIV total_toks
           |  ELSE available_toks DIV greatest(total_toks DIV 1000000, 1)
           |  END""".stripMargin))
      .withColumn("u_micros",
        floor(lit(1000000.0) * exp(alpha *
          log(greatest(col("share_millionths"), lit(1L)).cast("double"))))
          .cast("long"))
      .withColumn("sum_u", sum("u_micros").over(all))
      .withColumn("temp_weight_millionths",
        expr("(u_micros * 1000000) DIV sum_u"))
  }

  /** The per-doc (lang, token count, hash bucket) scan both mixture
    * materializers start from. */
  private def tokCountedDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(graft.functions.TextFunctions.tokenize(col("text")))
          .cast("long").as("n_toks"),
        bucketMillionths(col("doc_id")).as("bm"))

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement (A-Res,
    * IPL 2006): each doc draws key = ln(u)/w with u deterministic from
    * its id ([[bucketMillionths]], shifted off zero) and w = its token
    * count; the k LARGEST keys are the sample — inclusion probability
    * proportional to weight in one pass, no replacement bookkeeping,
    * no sequential state. The length-weighted subsample every
    * token-budgeted pipeline wants ("sample tokens, not documents").
    *
    * Exactness: the key is floored to integer millionths after ONE
    * float expression (ln → divide → scale, same operation order in
    * the oracle — the NB log-weight discipline), so ranking compares
    * exact integers and top-k membership is engine-exact; ties break
    * on doc_id.
    *
    * 100 TB shape: the key is scan-fused per-row math and the top-k
    * plans as TakeOrderedAndProject — per-partition heaps of k rows
    * merged at the driver, never a global sort. */
  def weightedSample(s: SparkSession, dir: String, k: Int = 100)
      : DataFrame =
    tokCountedDocs(s, dir).filter(col("n_toks") > 0)
      .withColumn("key_micro",
        floor(log((col("bm").cast("double") + lit(0.5d))
            / lit(1000000.0d))
          / col("n_toks").cast("double") * lit(1000000.0d))
          .cast("long"))
      .orderBy(col("key_micro").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("lang"), col("n_toks"),
        col("key_micro"))

  private def availByLang(docs: DataFrame): DataFrame =
    docs.groupBy("lang")
      .agg(sum("n_toks").as("available_toks"), count(lit(1)).as("n_docs"))

  /** Domain-mixture materialization to a TOKEN BUDGET — the "data
    * mixing" step of corpus assembly: given target mixture weights per
    * source (here: lang, in millionths) and a total token budget, each
    * source gets target = budget·w/1e6 tokens, delivered as
    * `full_epochs` whole passes over the source (upsampling — sources
    * smaller than their target repeat, the standard multi-epoch trick)
    * plus a deterministic hash-sampled remainder at
    * `rem_rate_millionths`. The budget is self-scaling (half the
    * corpus's total tokens) so the operator exercises both the
    * upsample and downsample paths at every SF.
    *
    * All arithmetic is int64: rates are computed as
    * `rem DIV max(avail DIV 1e6, 1)` rather than `rem·1e6 DIV avail` —
    * same value to ±1 millionth, but the numerator never multiplies a
    * token count by 1e6, which would overflow int64 exactly at the
    * 100 TB corpora this is for (2.5e13 tokens · 1e6 > 2^63). Plan
    * shape: one token-count aggregate over the corpus (map-side
    * combined), a langs-sized rate table broadcast back onto the scan,
    * and a per-row hash decision — the corpus never shuffles. */
  def mixtureBudget(s: SparkSession, dir: String,
                    weights: Map[String, Long],
                    defaultWeight: Long = 100000L): DataFrame = {
    val docs = tokCountedDocs(s, dir)
    val wcol = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (k, m)) => when(col("lang") === k, lit(m)).otherwise(acc)
    }
    mixtureBudgetFrom(docs, availByLang(docs).withColumn("w", wcol))
  }

  /** [[mixtureBudget]] with the per-source weights DERIVED FROM THE
    * CORPUS by [[temperatureWeights]] instead of hand-configured — the
    * full self-tuning data-mixing step: one pass establishes per-lang
    * token mass, the α-flattened weights fall out of the langs-sized
    * arithmetic, and the same epochs-plus-hash-remainder materializer
    * delivers each source's target. Composition exercises the
    * interface the per-stage gates can't see: the weight table keeps
    * its extra diagnostic columns until the rate projection drops
    * them, and the budget arithmetic consumes the derived w with the
    * identical overflow discipline as a configured one. */
  def temperatureMixtureBudget(s: SparkSession, dir: String,
                               alphaMillionths: Long = TempAlphaMillionths)
      : DataFrame = {
    val docs = tokCountedDocs(s, dir)
    mixtureBudgetFrom(docs,
      withTempWeight(availByLang(docs), alphaMillionths)
        .withColumn("w", col("temp_weight_millionths")))
  }

  /** Budget materialization from a weighted per-lang aggregate
    * (lang, available_toks, n_docs, w) — the shared tail of both
    * mixture materializers. */
  private def mixtureBudgetFrom(docs: DataFrame,
                                weightedAvail: DataFrame): DataFrame = {
    val budget = docs.agg(expr("sum(n_toks) DIV 2").as("budget"))
    // target = budget·w/1e6 in two overflow-safe int64 terms: the naive
    // budget*w product exceeds 2^63 exactly at 100 TB token counts
    val rates = weightedAvail.crossJoin(budget)
      .withColumn("target_toks",
        expr("(budget DIV 1000000) * w + ((budget % 1000000) * w) DIV 1000000"))
      .select(col("lang"), col("available_toks"), col("n_docs"),
        col("target_toks"),
        expr("target_toks DIV available_toks").as("full_epochs"),
        // exact rem·1e6/avail while the product fits int64 (avail < 2^43
        // tokens — any per-source slice below ~9e12 tokens); above that,
        // divide-first: ±1-millionth precision there is invisible, but
        // losing 1e6× precision at SMALL scale (the exact regime) is not
        least(lit(999999L), expr(
          s"""CASE WHEN available_toks < ${1L << 43}
             |  THEN ((target_toks % available_toks) * 1000000)
             |    DIV available_toks
             |  ELSE (target_toks % available_toks)
             |    DIV greatest(available_toks DIV 1000000, 1) END""".stripMargin))
          .as("rem_rate_millionths"))
    val kept = docs.join(broadcast(rates.select(col("lang"),
        col("rem_rate_millionths"))), "lang")
      .filter(col("bm") < col("rem_rate_millionths"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs_sampled"),
        sum("n_toks").as("sampled_toks"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("available_toks"), col("n_docs"),
        col("target_toks"), col("full_epochs"), col("rem_rate_millionths"),
        coalesce(col("n_docs_sampled"), lit(0L)).as("n_docs_sampled"),
        coalesce(col("sampled_toks"), lit(0L)).as("sampled_toks"),
        (col("full_epochs") * col("available_toks") +
          coalesce(col("sampled_toks"), lit(0L))).as("achieved_toks"))
      .orderBy("lang")
  }

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

  /** NEAR-dup tier of the split leakage audit — [[splitLeakageAudit]]
    * catches only byte-identical leaks; a paraphrased or lightly edited
    * test document in train is the same eval-integrity hole and needs
    * the similarity machinery: asymmetric LSH candidates across the
    * split ([[Dedup.minhashLshPairsAcross]] — |test|·bucket-sized, never
    * corpus²), then exact Jaccard verification restricted to candidate
    * docs only (a semi-join bounds the expensive tier to the handful of
    * docs LSH implicated).
    *
    * The gated query runs on the planted near-dup corpus (the
    * dedup-family convention, SQL-regenerable) so the audit provably
    * catches cross-split near-dups at every SF. The verified tier is
    * pinned to τ = 0.9 — the planted band — so the DuckDB recompute and
    * the LSH→exact path agree on ANY corpus draw: at J ≥ 0.9 banded-LSH
    * miss probability is ≤ 2e-4 per pair (vs ~60% at J = 0.5, where an
    * organic mid-Jaccard pair after a testdata regen was a deterministic
    * coin flip against the oracle). A production audit hunting the
    * J ∈ [0.5, 0.9) band runs the exact tier as its own oracle
    * (corpus_assembly's choice) or accepts LSH recall < 1. */
  def splitLeakageNearDup(docs: DataFrame,
                          testPct: Int = 10, tau: Double = 0.9): DataFrame = {
    val flagged = docs.withColumn("__is_test",
      hashBucket(col("doc_id")) < testPct)
    val cand = Dedup.minhashLshPairsAcross(flagged, "__is_test", 32, 8, 0.4)
      .withColumn("id_a", least(col("test_id"), col("train_id")))
      .withColumn("id_b", greatest(col("test_id"), col("train_id")))
    // exact tier evaluates ONLY the candidate pairs (jaccardVerifyPairs
    // — no all-pairs join even among candidate docs)
    val verified = cand.join(
      Dedup.jaccardVerifyPairs(docs, cand.select("id_a", "id_b"), tau)
        .select("id_a", "id_b"),
      Seq("id_a", "id_b"), "left_semi")
    flagged.filter(col("__is_test")).agg(count(lit(1)).as("n_test"))
      .crossJoin(flagged.filter(!col("__is_test"))
        .agg(count(lit(1)).as("n_train")))
      .crossJoin(verified.agg(count(lit(1)).as("n_neardup_pairs"),
        countDistinct("test_id").as("n_leaky_test_docs")))
      .select(col("n_train"), col("n_test"), col("n_neardup_pairs"),
        col("n_leaky_test_docs"))
  }
}
