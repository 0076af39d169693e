package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation composition every LLM training-data
  * pipeline runs — quality gate → PII scrub → exact dedup → deterministic
  * sample — expressed as ONE declarative plan.
  *
  * The point at 100 TB: because every stage before the dedup is per-row
  * column math over the same rows, Catalyst fuses tokenization, quality
  * features, the scrub regexes, and the final sample filter into a single
  * scan-side pass, and the ONLY shuffle in the whole pipeline is the
  * dedup's hash partition on content_hash. Stage boundaries exist in code
  * for humans; the physical plan sees one pass + one exchange — not four
  * materialized intermediates.
  */
object Curation {

  /** Quality-gate (≥ `minQuality` on TextAnalysis's 0.4/0.6 blend) →
    * scrub (TextAnalysis regexes) → exact dedup on the scrubbed hash
    * (keep lowest doc_id) → `pct`% reproducible hash sample
    * (Sampling.hashBucket). Runs on the planted-PII fixture so the
    * scrub stage has real work the oracle can recompute. */
  def curationPipeline(s: SparkSession, dir: String,
                       minQuality: Double = 0.3, pct: Int = 50): DataFrame = {
    val staged = TextAnalysis.withSyntheticPii(Tables.documents(s, dir))
      .withColumn("toks", tokenize(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      // the scrub and quality semantics live in TextAnalysis — one Scala
      // definition each, so this pipeline can't drift from pii_scrub /
      // quality_score
      .withColumn("quality_score", TextAnalysis.qualityExpr(col("toks")))
      .filter(col("quality_score") >= minQuality)
      .withColumn("scrubbed_fp", md5(TextAnalysis.scrubExpr(col("text"))))
    val w = Window.partitionBy("scrubbed_fp").orderBy("doc_id")
    staged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(Sampling.hashBucket(col("doc_id")) < pct)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("scrubbed_fp"))
  }

  /** Small-cell suppression for aggregate releases — the
    * k-anonymity-style publication gate: per-group statistics whose
    * group holds fewer than `k` members are withheld and rolled into a
    * single `__suppressed__` residual row, so a published breakdown
    * never reveals a group small enough to identify while the grand
    * total stays reconcilable (residual carries the suppressed doc
    * mass and the count of suppressed cells). One corpus aggregation;
    * the suppression split and residual are cells-sized
    * re-aggregations. The residual row is ALWAYS emitted (zeros when
    * nothing was suppressed) so the release schema is stable across
    * refreshes. */
  def smallCellRelease(s: SparkSession, dir: String,
                       k: Long = 8L): DataFrame = {
    val cells = Tables.documents(s, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokenize(col("text"))).cast("long")).as("n_toks"))
    val kept = cells.filter(col("n_docs") >= k)
      .withColumn("n_cells", lit(1L))
    val residual = cells.filter(col("n_docs") < k)
      .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
        coalesce(sum("n_toks"), lit(0L)).as("n_toks"),
        count(lit(1)).as("n_cells"))
      .select(lit("__suppressed__").as("lang"),
        lit("__suppressed__").as("source"),
        col("n_docs"), col("n_toks"), col("n_cells"))
    kept.select(col("lang"), col("source"), col("n_docs"), col("n_toks"),
        col("n_cells"))
      .unionByName(residual)
      .orderBy("lang", "source")
  }

  /** Per-language quality-percentile curation — the relative-threshold
    * knob (an absolute quality cutoff like curationPipeline's keeps a
    * different fraction per source; a percentile keeps the BEST pct% of
    * each, the usual way quality filters ship). Keep = rank ≤
    * (n_lang·pct) DIV 100 in (quality DESC, doc_id) order — integer
    * arithmetic, deterministic ties, engine-recomputable. One hash
    * exchange on lang feeds both the count and the rank windows; the
    * per-lang sort is the only corpus-scale work (at 100 TB partitions
    * are per-source and the sort is per-partition, the trainingShards
    * argument). */
  def qualityTopPct(s: SparkSession, dir: String, pct: Int = 25): DataFrame = {
    val scored = Tables.documents(s, dir)
      .withColumn("quality_score",
        TextAnalysis.qualityExpr(tokenize(col("text"))))
      .filter(col("quality_score").isNotNull)
      .select("doc_id", "lang", "quality_score")
    val rankW = Window.partitionBy("lang")
      .orderBy(desc("quality_score"), asc("doc_id"))
    val langW = Window.partitionBy("lang")
    scored.withColumn("rk", row_number().over(rankW))
      .withColumn("n_lang", count(lit(1)).over(langW))
      .filter(col("rk") <= expr(s"(n_lang * $pct) DIV 100"))
      .select(col("doc_id"), col("lang"), col("quality_score"), col("rk"))
  }

  /** Curation driven by the TRAINED quality filter instead of the
    * hand-written heuristic blend — the composition a production stack
    * actually runs once a learned filter exists: train the perceptron
    * on the cluster, score every doc scan-side, keep the positive
    * class, and report the per-lang survivor mass (docs + tokens of
    * ORIGINAL text — the planted markers are training scaffolding, not
    * corpus content). The whole chain stays integer-exact, so the
    * oracle retrains the identical model and reproduces the survivor
    * counts byte-for-byte — a hash-verified learned-filter pipeline. */
  def trainedQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val pred = QualityClassifier.qualityPerceptron(s, dir)
      .select(col("doc_id"), col("pred"))
    Tables.documents(s, dir)
      .join(pred, Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("pred") === 1L).cast("long")).as("n_kept"),
        sum(when(col("pred") === 1L,
          size(tokenize(col("text"))).cast("long"))
          .otherwise(lit(0L))).as("n_toks_kept"))
      .orderBy("lang")
  }

  /** Contrastive training-pair generation — the data an embedding
    * model (SimCSE/contrastive-pretraining style) trains on: for each
    * anchor with a known near-duplicate, one POSITIVE (its planted
    * near-dup twin) and `k` hash-drawn NEGATIVES from the rest of the
    * corpus. The negative draw is the deterministic multiplicative
    * hash over (anchor, rank) mapped into the live doc_id range, with
    * a +1 remap off the anchor itself — reproducible across engines
    * and epochs, which is what makes the training set auditable. One
    * row per (anchor, neg_rank): all int64.
    *
    * Scale shape: negatives are per-row hash math against the
    * broadcast corpus-size scalar — no sampling join, no shuffle.
    * Assumes the dense [0, n) id space the testdata ships (at scale,
    * compose with TextAnalysis.denseIdsByCount to densify first; the
    * draw itself is unchanged). */
  def contrastivePairs(s: SparkSession, dir: String, k: Int = 3)
      : DataFrame = {
    val corpus = Dedup.withNearDups(Tables.documents(s, dir))
    val ids = corpus.select(col("doc_id")).filter(
      col("doc_id") < Dedup.DupIdOffset)
    val n = ids.agg(count(lit(1)).as("n"))
    val anchors = ids.filter(col("doc_id") < Dedup.PlantCount)
      .crossJoin(broadcast(n))
      .select(col("doc_id").as("anchor_id"),
        (col("doc_id") + Dedup.DupIdOffset).as("pos_id"), col("n"))
    anchors
      .select(col("anchor_id"), col("pos_id"), col("n"),
        explode(sequence(lit(1L), lit(k.toLong))).as("neg_rank"))
      .withColumn("raw_neg",
        Sampling.hashOrderKey(col("anchor_id") * lit(k.toLong)
          + col("neg_rank")) % col("n"))
      .withColumn("neg_id",
        when(col("raw_neg") === col("anchor_id"),
          (col("raw_neg") + 1) % col("n")).otherwise(col("raw_neg")))
      .select(col("anchor_id"), col("pos_id"), col("neg_rank"),
        col("neg_id"))
      .orderBy("anchor_id", "neg_rank")
  }

  /** Per-domain document cap — the RefinedWeb anti-domination rule: no
    * source may contribute more than `cap` documents, and WHICH `cap`
    * survive is a deterministic random draw (hash order), not a quality
    * rank — capping exists to bound any one domain's influence, so a
    * biased within-domain pick would defeat the point. One source-keyed
    * exchange feeds the rank window (the qualityTopPct shape: domains
    * are plentiful, so partitions spread; output is cap-bounded per
    * domain by construction). */
  def domainCap(s: SparkSession, dir: String, cap: Int = 50): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("hkey"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        Sampling.hashOrderKey(col("doc_id")).as("hkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"),
        col("rk").cast("long").as("rk"))
      .orderBy("doc_id")
  }
}
