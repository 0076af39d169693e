package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The corpus-assembly capstone: every stage of a training-data pipeline
  * — curation, near-dup dedup, benchmark decontamination, mixture-to-
  * token-budget, shard assignment — COMPOSED into one declarative plan:
  * raw documents in, sharded training set out.
  *
  * Each stage's semantics are the already-gated per-stage operators
  * (TextAnalysis.qualityExpr/scrubExpr, Dedup.jaccardPairsAuto +
  * connectedComponentsStar, the contaminationCheck n-gram join,
  * Sampling's hash arithmetic), referenced rather than re-implemented, so
  * the composition cannot drift from the stages it composes. What the
  * composition itself adds — and what the per-stage gates cannot see — is
  * the interface friction: this plan is where a redundant shuffle between
  * stages would hide. Audit (see PlanSpec "corpus_assembly"):
  *
  *   - stage 1 (quality gate + scrub) is pure per-row column math and
  *     fuses into the scan — zero exchanges;
  *   - stage 2 (exact dedup) is ONE hash exchange on the scrubbed
  *     fingerprint;
  *   - stage 3 (near-dup) shuffles inside the Jaccard tier + components
  *     iterations — the dedup family's own audited shape;
  *   - stage 4 (decontamination) BROADCASTS the benchmark n-gram set
  *     (benchmark suites are MBs at any corpus scale) — the corpus side
  *     contributes one explode + one distinct-on-doc_id aggregation;
  *   - stage 5 (mixture budget) aggregates a langs-sized rate table and
  *     broadcasts it back — the corpus never shuffles for it;
  *   - stage 6 (sharding) is the trainingShards shape: shard from the
  *     hash high bits scan-side, ONE exchange on the shard key, per-shard
  *     in-memory sort.
  *
  * Near-dup tier choice: the gated composition verifies with the EXACT
  * bigram-Jaccard tier (jaccardPairsAuto), not the LSH candidate tier,
  * so the DuckDB oracle recomputes it exactly on ANY corpus — an organic
  * pair at J ∈ [0.5, 0.9), where banded-LSH recall is a deterministic
  * coin flip, can never flip this gate red after a testdata regen. The
  * `lshTier = true` knob swaps in the 100 TB production tier (LSH
  * candidates verified pair-by-pair, nearDupPipeline's shape); its
  * candidate-tier agreement is separately gated
  * (dedup_minhash_agreement) and CorpusAssemblySpec pins the tier
  * containment invariant.
  *
  * Epoch semantics (stage 5): a source smaller than its token target
  * repeats — `full_epochs` whole passes (capped at `maxEpochs`, the
  * standard upsampling guard) plus a hash-sampled remainder pass; each
  * kept (doc, epoch) replica is an independent row of the training set
  * and shards independently via a replica id `doc_id·(maxEpochs+2) +
  * epoch` (the factor strictly bounds epoch, keeping replica ids
  * collision-free and the assignment engine-recomputable).
  */
object CorpusAssembly {

  /** Gate defaults, shared with the DuckDB oracle: SparkEntry
    * interpolates THESE into the corpus_assembly SQL, so changing a
    * default here re-derives both engines' arithmetic from one value
    * instead of silently desyncing the gate (the ADVICE-r8 ShardN
    * pattern, applied to the much larger capstone oracle). de's weight
    * (~4× its ~14% token share) forces the multi-epoch upsample path at
    * every SF, so the gate covers replica explode + replica sharding,
    * not just the downsample filter. */
  val DefaultMinQuality = 0.3
  val DefaultTau = 0.5
  val DefaultBenchMaxId = 50L
  val DefaultNgram = 8
  val DefaultWeights: Map[String, Long] =
    Map("en" -> 500000L, "zh" -> 150000L, "de" -> 600000L)
  val DefaultWeightOther = 100000L
  val DefaultMaxEpochs = 20
  val DefaultNShards = 8

  /** Near-dup tau of the LSH-tier capstone GATE (corpus_assembly_lsh):
    * at J ≥ 0.9 the candidate tier's recall is effectively
    * deterministic (exact copies hash to identical MinHash signatures;
    * a 0.9-Jaccard pair's band-miss odds are ~(1−0.9⁴)⁸ ≈ 2e-4,
    * deterministic per corpus), so the production tier and the
    * SQL-exact closure keep the same survivors and ONE oracle template
    * gates both. Shared with the oracle via SparkEntry interpolation. */
  val LshGateTau = 0.9

  def corpusAssembly(s: SparkSession, dir: String,
                     minQuality: Double = DefaultMinQuality,
                     tau: Double = DefaultTau,
                     benchMaxId: Long = DefaultBenchMaxId,
                     ngram: Int = DefaultNgram,
                     weights: Map[String, Long] = DefaultWeights,
                     defaultWeight: Long = DefaultWeightOther,
                     maxEpochs: Int = DefaultMaxEpochs,
                     nShards: Int = DefaultNShards,
                     lshTier: Boolean = false): DataFrame = {
    val docs = Tables.documents(s, dir)

    // stage 1: curation — quality gate on raw tokens (curationPipeline's
    // convention), then PII scrub; all downstream content work (dedup
    // fingerprints, Jaccard features, decontamination grams, token
    // counts) runs on the SCRUBBED text, because that is the text being
    // trained on
    val curated = docs
      .withColumn("quality_score",
        TextAnalysis.qualityExpr(tokenize(col("text"))))
      .filter(col("quality_score") >= minQuality)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.scrubExpr(col("text")).as("ctext"))

    // stage 2: exact dedup on the scrubbed fingerprint, keep min doc_id.
    // exactKept fans out to SEVEN consumers (pair features, survivor
    // anti-join, both gram sides, and the three budget aggregates) —
    // without materialization each one re-expands the scan+window
    // subtree, i.e. seven full corpus passes at 100 TB. Checkpoint ONCE.
    // scratch (NOT materialize): the returned lazy plan keeps reading
    // this frame, so under the reliable knob nobody could ever dropRound
    // it and every invocation would leak a corpus-scale DFS snapshot.
    val wfp = Window.partitionBy(md5(col("ctext"))).orderBy(col("doc_id"))
    val exactKept = Checkpoints.scratch(
      curated.withColumn("__rn", row_number().over(wfp))
        .filter(col("__rn") === 1).drop("__rn"))

    // stage 3: near-dup dedup — Jaccard pairs ≥ tau → connected
    // components → drop every non-representative member. Two tiers:
    // the default all-pairs exact tier is the ORACLE-EXACT choice the
    // gate runs (SQL-recomputable on any corpus draw); `lshTier = true`
    // is the 100 TB production path — LSH candidates verified pair-by-
    // pair (nearDupPipeline's shape, work bounded by the candidate
    // tier, not the corpus pair structure). On a corpus whose passing
    // pairs sit at J ≥ 0.9 the two tiers produce identical survivors
    // (CorpusAssemblySpec pins it); at mid-Jaccard the LSH tier trades
    // deterministic-per-corpus recall for the bounded candidate join.
    val asText = exactKept.select(col("doc_id"), col("ctext").as("text"))
    val pairs =
      if (lshTier)
        Dedup.jaccardVerifyPairs(asText,
          Dedup.minhashLshPairs(asText, 32, 8, 0.4), tau)
      else Dedup.jaccardPairsAuto(asText, tau)
    val dropped = Dedup.connectedComponentsStar(pairs.select("id_a", "id_b"))
      .filter(col("comp") =!= col("doc_id")).select("doc_id")
    val survivors = exactKept.join(dropped, Seq("doc_id"), "left_anti")

    // stage 4: benchmark decontamination — the benchmark set (doc_id <
    // benchMaxId, defined on the RAW corpus: an eval suite exists outside
    // any curation decision) contributes its distinct scrubbed n-grams as
    // a broadcast; any training candidate sharing one is dropped
    val benchGrams = docs.filter(col("doc_id") < benchMaxId)
      .select(explode(array_distinct(wordNgrams(
        tokenize(TextAnalysis.scrubExpr(col("text"))), ngram))).as("gram"))
      .distinct()
    val trainSide = survivors.filter(col("doc_id") >= benchMaxId)
    val contaminated = trainSide
      .select(col("doc_id"), explode(array_distinct(
        wordNgrams(tokenize(col("ctext")), ngram))).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .select("doc_id").distinct()
    // three consumers (avail, budget, replicas) → materialize once; the
    // checkpointed frame is 4 narrow columns, not the corpus text.
    // scratch for the same leak reason as exactKept.
    val train = Checkpoints.scratch(
      trainSide.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"),
          size(tokenize(col("ctext"))).cast("long").as("n_toks"),
          Sampling.bucketMillionths(col("doc_id")).as("bm")))

    // stage 5: mixture to token budget — Sampling.mixtureBudget's exact
    // int64 arithmetic (overflow-safe at 100 TB token counts), applied
    // as replica materialization: copies = full_epochs + the hash-
    // sampled remainder pass
    val wcol = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (k, m)) => when(col("lang") === k, lit(m)).otherwise(acc)
    }
    val avail = train.groupBy("lang").agg(sum("n_toks").as("available_toks"))
    val budget = train.agg(expr("sum(n_toks) DIV 2").as("budget"))
    val rates = avail.crossJoin(budget)
      .withColumn("w", wcol)
      .withColumn("target_toks",
        expr("(budget DIV 1000000) * w + ((budget % 1000000) * w) DIV 1000000"))
      .select(col("lang"),
        least(expr("target_toks DIV available_toks"),
          lit(maxEpochs.toLong)).as("full_epochs"),
        least(lit(999999L), expr(
          s"""CASE WHEN available_toks < ${1L << 43}
             |  THEN ((target_toks % available_toks) * 1000000)
             |    DIV available_toks
             |  ELSE (target_toks % available_toks)
             |    DIV greatest(available_toks DIV 1000000, 1) END"""
            .stripMargin)).as("rem_rate_millionths"))
    val replicas = train.join(broadcast(rates), "lang")
      .withColumn("copies", col("full_epochs") +
        when(col("bm") < col("rem_rate_millionths"), 1L).otherwise(0L))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("lang"), col("n_toks"),
        explode(sequence(lit(0L), col("copies") - 1)).as("epoch"))

    // stage 6: deterministic shard assignment over replica ids — the
    // trainingShards shape (hash high bits scan-side, one exchange on
    // shard, per-shard sort)
    val repId = col("doc_id") * lit((maxEpochs + 2).toLong) + col("epoch")
    val keyed = replicas
      .withColumn("rep_id", repId)
      .withColumn("hkey", Sampling.hashOrderKey(col("rep_id")))
      .withColumn("shard", Sampling.shardOf(col("hkey"), nShards))
    val wsh = Window.partitionBy(col("shard"))
      .orderBy(col("hkey"), col("rep_id"))
    keyed.withColumn("pos", row_number().over(wsh))
      .select(col("doc_id"), col("epoch").cast("int").as("epoch"),
        col("lang"), col("n_toks"), col("shard"), col("pos"))
  }

  /** The refresh capstone — [[corpusAssembly]]'s daily complement: cold
    * assembly builds a corpus once; this is the shape every morning
    * after — fold the day's change set into the base snapshot, drop
    * fresh arrivals that near-duplicate what the corpus already holds,
    * re-shard, and gate the refresh on distribution drift. Each stage
    * is an already-gated operator referenced, not re-implemented
    * (Incremental.mergeUpsert / Dedup.incrementalNearDup /
    * Sampling.hashOrderKey+shardOf / Profile.tokenDriftKl); what the
    * composition adds — and what the per-stage gates cannot see — is
    * the interface friction between them (the corpus_assembly
    * argument).
    *
    * Plan shape: the merge is ONE co-partitioned full-outer shuffle;
    * the merged snapshot is scratch-materialized ONCE for its three
    * consumers (fresh side, existing side, survivor anti-join);
    * incrementalNearDup's work is |fresh|·bucket-bounded (asymmetric
    * LSH — never corpus²); the refreshed corpus materializes once for
    * its two consumers (drift counts, shard aggregate); the drift gate
    * and drop count ride back as one-row broadcasts (the
    * above_average_orders pattern), so the corpus never shuffles for
    * them. Output: per-shard doc/token stats of the refreshed corpus,
    * with the audit scalars (dropped-fresh count, before/after token
    * totals, union vocab, add-1-smoothed KL millionths) repeated on
    * every row — nShards rows total.
    *
    * Dedup-tier caveat (incremental_neardup's triage note, inherited):
    * fresh arrivals here are exact re-crawls (J = 1 — identical MinHash
    * signatures, so LSH recall is deterministically 1) or re-crawls of
    * since-revised docs (J ≈ n/(n+2) ≥ 0.9 — band-miss odds ~1e-11 per
    * pair, deterministic per corpus); an organic cross-increment pair
    * AT J ≈ 0.9 after a testdata regen is the one thing that could
    * split the engines. */
  def corpusRefreshAssembly(s: SparkSession, dir: String,
                            nShards: Int = DefaultNShards,
                            tau: Double = Dedup.IncrementalTau): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val merged = Checkpoints.scratch(
      Incremental.mergeUpsert(base, Incremental.syntheticDelta(base),
        "doc_id"))
    val fresh = merged.filter(col("row_status") === "inserted")
      .select(col("doc_id"), col("text"))
    val existing = merged.filter(col("row_status") =!= "inserted")
      .select(col("doc_id"), col("text"))
    // scratch: two consumers (survivor anti-join, audit count) — without
    // it the count's plan re-expands the whole LSH+verify subtree
    val dropped = Checkpoints.scratch(
      Dedup.incrementalNearDup(existing, fresh, tau).select("doc_id"))
    val refreshed = Checkpoints.scratch(
      merged.join(dropped, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("text")))
    val kl = Profile.tokenDriftKl(base, refreshed)
    val nDropped = dropped.agg(count(lit(1)).as("n_dropped_fresh"))
    val shards = refreshed
      .select(Sampling.shardOf(
          Sampling.hashOrderKey(col("doc_id")), nShards).as("shard"),
        size(tokenize(col("text"))).cast("long").as("n_toks"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("shard_toks"))
    shards.crossJoin(broadcast(nDropped)).crossJoin(broadcast(kl))
      .orderBy("shard")
  }
}
