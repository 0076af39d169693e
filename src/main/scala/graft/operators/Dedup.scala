package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact content
  * hash, exact n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
  * near-dup.
  *
  * Scale stance (100 TB): the exact pairwise operators (`jaccardPairs`,
  * `embeddingNearDupPairs`) are the *verification* tier — quadratic in
  * candidates, so they run AFTER a candidate generator bounds the pair
  * space. The generators are the LSH tiers (`minhashLshPairs`,
  * `simhashPairs`): shuffle cost is O(rows × bands), candidates only
  * within equal-signature buckets, no cross join anywhere. Exact dedup is
  * one hash-partitioned aggregation on a 128-bit key.
  *
  * The testdata `documents` table has no duplicates at all, so each demo
  * query plants duplicates first (`withExactDups`/`withNearDups` append
  * copies with doc_id+10000, the near variant dropping the first token) —
  * the oracle SQL plants the identical rows, keeping the check exact.
  */
object Dedup {

  val DupIdOffset = 10000L

  /** documents ∪ exact copies of doc_id < 20 (new ids). */
  def withExactDups(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.union(base.filter(col("doc_id") < 20)
      .select((col("doc_id") + DupIdOffset).as("doc_id"), col("text")))
  }

  /** documents ∪ near copies (first token dropped) of doc_id < 20. */
  def withNearDups(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.union(base.filter(col("doc_id") < 20)
      .select((col("doc_id") + DupIdOffset).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))
  }

  /** Exact dedup groups: content-hash → group size + representative
    * (min doc_id). One shuffle on the hash key. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_doc_id"))

  /** Exact dedup: keep one representative row per distinct content. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.join(
      exactGroups(docs).select(col("keep_doc_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Per-doc distinct word-bigram sets, exploded to a posting list. */
  private def bigramPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(wordNgrams(tokenize(col("text")), 2)))
          .as("feat"))

  /** Exact n-gram (word-bigram) Jaccard similarity pairs ≥ tau.
    * Postings-list self-join: |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|.
    * Quadratic only in docs *sharing a feature* — at scale, add prefix
    * filtering or run behind minhashLshPairs candidates. */
  def jaccardPairs(docs: DataFrame, tau: Double): DataFrame = {
    val posts = bigramPostings(docs)
    val sizes = posts.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    val inter = posts.as("a")
      .join(posts.as("b"),
        col("a.feat") === col("b.feat") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("set_size").as("sa")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("set_size").as("sb")), "id_b")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("sa") + col("sb") - col("n_inter")), 6))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** MinHash signature: k independent min-hashes over distinct char-5
    * shingles. h_i(s) = xxhash64(s, i); signature[i] = min over shingles. */
  def minhashSignature(text: Column, k: Int): Column = {
    val shingles = charShingles(text, 5)
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))
  }

  /** MinHash+LSH near-dup pairs: band the k-wide signature into `bands`
    * rows-per-band groups, bucket-join on (band index, band hash), then
    * keep candidates whose signature-equality fraction estimates
    * Jaccard ≥ tau. No cross join: candidates only from equal buckets. */
  def minhashLshPairs(docs: DataFrame, k: Int, bands: Int, tau: Double): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = docs.select(col("doc_id"),
      minhashSignature(col("text"), k).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_key",
        xxhash64(col("band"), expr(s"slice(sig, band * $r + 1, $r)")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / k, 6))
      .filter(col("est_jaccard") >= tau)
      .select("id_a", "id_b", "est_jaccard")
      .orderBy("id_a", "id_b")
  }

  /** 62-bit SimHash over the word-bigram multiset (62 keeps the packed
    * value positive under ANSI long arithmetic). Bit b is the sign of
    * Σ_features ±1 (hash bit b of the feature), repetitions weighting
    * naturally via the non-distinct feature array. */
  def simhash(text: Column, bits: Int = 62): Column = {
    val feats = wordNgrams(tokenize(text), 2)
    // shiftrightunsigned's Scala wrapper only accepts a literal shift;
    // call the SQL function directly to shift by the lambda variable
    val bitArr = transform(sequence(lit(0), lit(bits - 1)), b =>
      when(aggregate(feats, lit(0L), (acc, f) =>
        acc + when(call_function("shiftrightunsigned", xxhash64(f), b)
          .bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))) > 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(reverse(bitArr), lit(0L), (acc, bit) => acc * 2 + bit)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found by
    * banding the fingerprint into (maxDist+1) chunks — pigeonhole: any
    * pair within maxDist agrees on ≥1 whole chunk, so candidates come
    * from equal-chunk buckets, never a cross join. */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    val chunkBits = 62 / nChunks + (if (62 % nChunks == 0) 0 else 1)
    val mask = (1L << chunkBits) - 1
    val withSig = docs.select(col("doc_id"), simhash(col("text")).as("sh"))
    val chunked = withSig.select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(nChunks - 1))).as("chunk"))
      .withColumn("chunk_key",
        call_function("shiftrightunsigned", col("sh"),
          col("chunk") * chunkBits).bitwiseAND(mask))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_key") === col("b.chunk_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .orderBy("id_a", "id_b")
  }

  /** Embedding near-dup: all pairs with cosine ≥ tau. Brute-force
    * pairwise at test scale (verification tier); the scale path buckets
    * by random-hyperplane LSH first (Similarity.lshBuckets). */
  def embeddingNearDupPairs(emb: DataFrame, tau: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(VectorFunctions.cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= tau)
      .select("id_a", "id_b", "sim")
      .orderBy("id_a", "id_b")
  }
}
