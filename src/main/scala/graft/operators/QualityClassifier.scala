package graft.operators

import graft.functions.TextFunctions.tokenize
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the CCNet/fastText-style
  * learned filter every production curation stack runs after the
  * hand-written heuristics (TextAnalysis.qualityExpr): a linear model
  * over hashed bag-of-words features, trained ON the cluster, applied
  * AS a scan-side scoring pass.
  *
  * The model is a batch perceptron kept entirely in int64 arithmetic —
  * feature counts, weights, margins, and updates are all exact
  * integers, so the full train-then-score pipeline is deterministic,
  * engine-independent, and hash-exact against a SQL oracle that unrolls
  * the same recurrence (the `lang_id_nb` integer-millionths discipline,
  * taken one step further: no floats anywhere, not even rounded ones).
  *
  * 100 TB shape: featurization is one corpus scan collapsed to ONE ROW
  * PER DOC — (doc_id, label, fmap: map<f → count>) over D = 258
  * buckets — and scratch-materialized. With the doc grouping baked into
  * the layout, a margin is a per-row fold over the row's own map
  * entries: each of the K training iterations is one pass over the
  * materialized rows plus a D-bounded gradient aggregate (map-side
  * combined into ≤ D rows per task), and the corpus-sized frame is
  * never shuffled — not by doc, not by feature. The weights are D+1
  * integers of driver metadata broadcast back as a map literal (the
  * k-means-codebook pattern). Scoring is shuffle-free scan math.
  */
object QualityClassifier {

  /** Feature-hash bucket count (weights index 0..D-1; D is the bias). */
  val D = 257

  /** Batch-perceptron iteration count — fixed so the oracle can unroll
    * exactly this many update steps. */
  val Iters = 6

  /** Planted-marker copies per document (see [[perceptronCorpus]]). */
  val MarkerCopies = 10

  /** Accuracy floor for the gate, in millis (950 = 95%). */
  val FloorMillis = 950

  /** Labeled training corpus. Like `TextAnalysis.nbCorpus`, the
    * testdata's text carries no label signal, so each doc gets a
    * deterministic marker suffix: label −1 (junk) iff doc_id % 3 == 0;
    * junk docs append [[MarkerCopies]] copies of "xjunk" plus one
    * "xclean" (and clean docs the mirror image) — the one-token overlap
    * keeps the classes non-degenerate, and the formula is trivially
    * SQL-expressible so the oracle regenerates the corpus and retrains
    * the identical model. */
  def perceptronCorpus(docs: DataFrame): DataFrame = {
    val junk = col("doc_id") % 3 === 0
    docs.select(col("doc_id"),
      when(junk, lit(-1L)).otherwise(lit(1L)).as("label"),
      concat(col("text"), lit(" "),
        when(junk,
          concat(repeat(lit("xjunk "), MarkerCopies), lit("xclean")))
        .otherwise(
          concat(repeat(lit("xclean "), MarkerCopies), lit("xjunk"))))
        .as("text"))
  }

  /** Feature index of one token: (codepoint of first char × 97 +
    * char length × 13) mod D — deliberately computable by ANY engine's
    * `ascii`/`length` (both Spark and DuckDB return the first
    * character's code point and the character count), so the hashed
    * feature space itself is part of the verified contract. Collisions
    * are fine: they are noise the trained weights absorb. */
  private def featureIdx(w: Column): Column =
    ((ascii(w) * lit(97) + length(w) * lit(13)) % lit(D)).cast("long")

  /** Per-doc sparse feature vector, ONE ROW PER DOC: (doc_id, label,
    * fmap: map<f → count>) including the bias entry (f = D, x = 1).
    * Collapsing to a map is the load-bearing layout choice: margins
    * become pure per-row map math, so neither training iterations nor
    * scoring ever shuffle by doc — the doc grouping happens exactly
    * once, here, before the scratch materialization. */
  def perceptronFeatures(docs: DataFrame): DataFrame = {
    val corpus = perceptronCorpus(docs)
    corpus
      // explode_outer + count(w) keeps token-less docs as an empty
      // entry list (collect_list skips the null sentinel)
      .select(col("doc_id"), col("label"),
        explode_outer(tokenize(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("label"), featureIdx(col("w")).as("f"))
      .agg(count(col("w")).as("x"))
      .groupBy(col("doc_id"), col("label"))
      .agg(map_concat(
        map_from_entries(collect_list(
          when(col("f").isNotNull, struct(col("f"), col("x"))))),
        map(lit(D.toLong), lit(1L))).as("fmap"))
  }

  /** Int64 margin of one doc under weights `w`: Σ_f w[f]·fmap[f] —
    * a codegen'd scan-side fold over the row's own entries, no shuffle. */
  private def marginExpr(w: Map[Long, Long]): Column =
    aggregate(map_entries(col("fmap")), lit(0L),
      (acc, e) => acc + weightOf(w, e.getField("key")) * e.getField("value"))

  /** Train [[Iters]] batch-perceptron steps; returns the weight vector
    * as an (f → w) map (≤ D+1 entries of driver metadata). Update rule,
    * all int64: margin_d = Σ_f w[f]·x[d,f]; doc d is misclassified iff
    * label_d·margin_d ≤ 0; w[f] += Σ_misclassified label_d·x[d,f]. From
    * w₀ = 0 every margin is 0, so step 1 is the class-centroid
    * difference; later steps correct the boundary. Per iteration the
    * cluster does one pass over the materialized per-doc rows and one
    * D-bounded aggregate (map-side combined) — the corpus-sized frame
    * is never shuffled. */
  def trainPerceptron(feats: DataFrame): Map[Long, Long] = {
    var w = Map.empty[Long, Long]
    for (_ <- 1 to Iters) {
      val grad = feats.withColumn("margin", marginExpr(w))
        .filter(col("margin") * col("label") <= 0)
        .select(col("label"), explode(map_entries(col("fmap"))).as("e"))
        .groupBy(col("e.key").as("f"))
        .agg(sum(col("label") * col("e.value")).as("g"))
        .collect()
      w = grad.foldLeft(w) { (acc, r) =>
        val f = r.getLong(0)
        acc.updated(f, acc.getOrElse(f, 0L) + r.getLong(1))
      }
    }
    w
  }

  /** Broadcast-as-literal weight lookup (empty model scores 0). */
  private def weightOf(w: Map[Long, Long], f: Column): Column =
    if (w.isEmpty) lit(0L)
    else coalesce(element_at(typedLit(w), f), lit(0L))

  /** Train on the planted corpus, then score every doc: (doc_id, label,
    * margin, pred) with pred = sign(margin) (margin 0 → −1, the same
    * deterministic tie the oracle takes). All int64 → hash-exact.
    * Scoring is shuffle-free per-row math over the materialized feature
    * rows; the only exchange in the returned plan is the presentation
    * sort. */
  def qualityPerceptron(s: SparkSession, dir: String): DataFrame = {
    val feats = Checkpoints.scratch(
      perceptronFeatures(Tables.documents(s, dir)))
    val w = trainPerceptron(feats)
    feats.select(col("doc_id"), col("label"),
        marginExpr(w).as("margin"))
      .select(col("doc_id"), col("label"), col("margin"),
        when(col("margin") > 0, lit(1L)).otherwise(lit(-1L)).as("pred"))
      .orderBy("doc_id")
  }

  /** STATELESS per-row scorer for a trained model — the serving path:
    * margin = bias + Σ_tokens w[f(token)], a single fold over the
    * row's own token array against the literal weight map. No feature
    * aggregation, no shuffle, no state — which is what lets the same
    * model score a STREAM scan-side (the weights ride into every
    * micro-batch plan as a literal). Integer addition is associative,
    * so the token-order fold equals the batch path's Σ_f w[f]·x[f]
    * EXACTLY — one model, two execution shapes, one oracle.
    *
    * GATE-SCHEMA CAVEAT (ADVICE r10): this entry runs the input through
    * [[perceptronCorpus]], i.e. over the PLANTED training schema — every
    * doc gets the label-derived marker suffix appended before scoring,
    * which is what makes the result oracle-recomputable (the oracle
    * replants identically) but means served predictions here reflect the
    * plant, not organic text. A production deployment scores a
    * pre-labeled/raw frame instead: build the margin fold directly over
    * `tokenize(text)` of the real corpus with the same literal weight
    * map — the scoring math is unchanged; only the plant wrapper is
    * test-harness scaffolding. */
  def scoreDocs(docs: DataFrame, w: Map[Long, Long]): DataFrame = {
    val bias = w.getOrElse(D.toLong, 0L)
    perceptronCorpus(docs)
      .select(col("doc_id"), col("label"),
        aggregate(tokenize(col("text")), lit(bias),
          (acc, t) => acc + weightOf(w, featureIdx(t))).as("margin"))
      .select(col("doc_id"), col("label"), col("margin"),
        when(col("margin") > 0, lit(1L)).otherwise(lit(-1L)).as("pred"))
  }

  /** One-row model-quality gate: (n_docs, n_correct, acc_ok) with the
    * [[FloorMillis]] accuracy floor — the eval pass a training pipeline
    * runs before trusting a refreshed filter model. */
  def qualityPerceptronGate(s: SparkSession, dir: String): DataFrame =
    qualityPerceptron(s, dir)
      .agg(count(lit(1)).as("n_docs"),
        sum((col("pred") === col("label")).cast("long")).as("n_correct"))
      .select(col("n_docs"), col("n_correct"),
        (col("n_correct") * 1000 >= col("n_docs") * FloorMillis)
          .cast("int").as("acc_ok"))
}
