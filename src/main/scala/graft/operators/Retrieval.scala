package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the BM25 ranking every
  * data-curation stack keeps around for eval-set mining, targeted
  * corpus slicing ("all docs about X"), and hard-negative selection
  * for retrieval training.
  *
  * Shape at 100 TB: the ONE corpus-scale exchange is the (doc, term)
  * term-frequency aggregation; document length and document frequency
  * are both re-aggregations of that frame (no second corpus pass), the
  * query set and its per-term df are broadcast (queries are KBs), so
  * scoring touches only the postings of the query terms — the classic
  * inverted-index probe expressed relationally. Per-query top-k runs a
  * rank window over candidate sets bounded by those postings; with a
  * large query batch the qid partitioning spreads the windows across
  * the cluster.
  *
  * Scores are emitted in integer micros (`floor(score·1e6)` per term,
  * summed as BIGINT) so the result is independent of float summation
  * order — the same fixed-point discipline as Profile.tokenDriftKl —
  * and exactly recomputable by the DuckDB oracle.
  */
object Retrieval {

  /** Okapi BM25 constants — interpolated into the oracle SQL from here
    * (the ShardN anti-desync pattern: one definition, both engines). */
  val K1 = 1.2
  val B = 0.75

  /** Fixed benchmark query set over the synthetic corpus vocabulary.
    * Tuples are (qid, space-separated terms); the oracle re-plants the
    * same rows via a VALUES list interpolated from this constant. */
  val Queries: Seq[(Long, String)] = Seq(
    (1L, "hash join table"),
    (2L, "fast scan filter"),
    (3L, "window agg group"),
    (4L, "spark data column"))

  /** BM25 score of every (query, doc) pair that shares at least one
    * term, top `k` docs per query. Ties break on doc_id so ranking is a
    * deterministic function of the corpus. */
  def bm25(docs: DataFrame, queries: Seq[(Long, String)], k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val qt = queries.toDF("qid", "qtext")
      .select(col("qid"), explode(split(col("qtext"), " ")).as("term"))
    bm25Ranked(docs, qt, k, excludeSelf = false)
  }

  /** The BM25 core over an arbitrary (qid, term) query frame — split
    * out so [[hybridRrf]] can use each query DOCUMENT's own tokens as
    * the lexical query (qid shares the doc_id space there, hence
    * `excludeSelf`: a query doc trivially tops its own ranking and
    * would shift every other rank by one). */
  private def bm25Ranked(docs: DataFrame, qt: DataFrame, k: Int,
                         excludeSelf: Boolean): DataFrame = {
    val terms = docs.select(col("doc_id"),
      explode(tokenize(col("text"))).as("term"))
    // tf fans out to FOUR consumers (dl, df, corpus stats, scoring) —
    // materialized once so the corpus is scanned and shuffled once, not
    // per consumer (AQE reuses only one of the four identical exchange
    // subtrees in practice; the exactKept precedent in CorpusAssembly)
    val tf = Checkpoints.scratch(
      terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    // dl and df are re-aggregations of tf (the distinct (doc,term)
    // pairs), not second corpus passes — tfidfTopTerms' trick
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val st = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tokens"))
    // attach df to the query terms first: the corpus-sized df relation
    // is probed by a broadcast join against the tiny query set, and the
    // result (query terms + their df) is what broadcasts to the postings
    val qdf = df.join(broadcast(qt), "term")
    val contrib = tf.join(broadcast(qdf), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      // ln(1 + (N - df + 0.5)/(df + 0.5)) — the Lucene non-negative idf
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      // dl/avgdl written as dl*N/total so both engines evaluate the
      // identical double expression tree (avgdl never materialized)
      .withColumn("tfn", col("tf") * lit(K1 + 1.0) /
        (col("tf") + lit(K1) * (lit(1.0) - lit(B) +
          lit(B) * col("dl") * col("n_docs") / col("n_tokens"))))
      .withColumn("contrib", floor(col("idf") * col("tfn") * lit(1000000.0)))
    val scores = contrib
      .filter(if (excludeSelf) col("qid") =!= col("doc_id") else lit(true))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_micro"))
    val w = Window.partitionBy("qid").orderBy(desc("score_micro"), asc("doc_id"))
    scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "doc_id", "n_terms", "score_micro", "rn")
  }

  /** Reciprocal-rank-fusion constants (Cormack et al. 2009): the
    * classic K = 60, and a nano-scale numerator so each rank's
    * contribution floor(1e9 / (K + rank)) is an exact integer both
    * engines agree on (1e9 = 2^9·5^9, so the only exactly-divisible
    * ranks yield exact IEEE quotients and the floor has no boundary
    * risk; inexact quotients are correctly rounded identically). */
  val RrfK = 60
  /** Per-ranker finalist depth fed into the fusion. */
  val RrfRankK = 50

  /** HYBRID retrieval — lexical BM25 ⊕ embedding cosine, fused by
    * reciprocal-rank fusion: the related-document query shape (the
    * first `nQueries` documents are the queries: their own DISTINCT
    * tokens form the lexical query, their embedding the dense query;
    * self-matches are excluded from both legs). Each leg ranks
    * independently and contributes its top [[RrfRankK]] finalists;
    * fusion score = Σ_legs floor(1e9 / (60 + rank)), a pure integer —
    * a doc missing from a leg's finalists contributes 0 from that leg.
    *
    * Fully oracle-checkable BECAUSE both legs are: BM25 is the
    * integer-micro template and the dense leg is the exact-cosine
    * ranking DuckDB recomputes with list arithmetic (the knn_bruteforce
    * oracle). At 100 TB the legs swap for their production tiers —
    * postings-probe BM25 (unchanged) and [[Similarity.knnIvfPq]]
    * instead of brute force — the fusion layer is ranker-agnostic and
    * touches only nq·rankK finalist rows per leg. */
  def hybridRrf(s: SparkSession, dir: String, k: Int = 10,
                nQueries: Int = 4): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val qt = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(tokenize(col("text")))).as("term"))
    val lex = bm25Ranked(docs, qt, RrfRankK, excludeSelf = true)
      .select(col("qid"), col("doc_id"), col("rn").as("r_lex"))
    val cos = Similarity
      .knnBruteForce(emb, emb.filter(col("vec_id") < nQueries), RrfRankK)
      .select(col("query_id").as("qid"), col("nn_id").as("doc_id"),
        col("rn").as("r_cos"))
    def leg(r: org.apache.spark.sql.Column) =
      coalesce(floor(lit(1000000000.0) / (lit(RrfK) + r)).cast("long"),
        lit(0L))
    val w = Window.partitionBy("qid").orderBy(desc("rrf_nano"), asc("doc_id"))
    lex.join(cos, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_nano", leg(col("r_lex")) + leg(col("r_cos")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "doc_id", "rrf_nano", "rn")
  }

  /** The gated entry: [[Queries]] against the documents table. */
  def bm25TopK(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25(Tables.documents(s, dir), Queries, k)

  /** Materialized inverted index — the searchable EXPORT complementing
    * [[bm25]] (which builds postings transiently per query set): per
    * lowercase token, document frequency, total term frequency, and
    * the ascending postings list. Postings serialize as a
    * comma-joined string (numerically sorted BEFORE the string cast —
    * lexicographic id order would be wrong — and engine-portable, the
    * user_event_type_sets convention). The heavy tail is the scale
    * hazard: a stopword's postings row at 100 TB IS the corpus, so
    * terms with df > dfCap keep their counts but NULL postings — the
    * classic stop-list degradation, bounding every output row by
    * dfCap ids (a production index shards those terms' postings
    * instead; the counts stay exact either way). One corpus explode +
    * two term-keyed aggregations, both map-side combined. */
  def invertedIndex(s: SparkSession, dir: String,
                    dfCap: Long = 64L): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("w"))
      .select(col("doc_id"), lower(col("w")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("p"))
      .select(col("term"), col("df"), col("total_tf"),
        when(col("df") <= dfCap, col("p")).as("postings"))
      .orderBy("term")
  }

  /** Chunk id packing: orig doc_id · stride + chunk_idx (stride
    * interpolated into the oracle; chunk counts are token-bounded so
    * the index never overflows the stride). */
  val ChunkIdStride = 1000000L

  /** The RAG-prep capstone: content-defined chunks → exact chunk dedup
    * → BM25 retrieval over the deduped CHUNK index. This is the shape a
    * retrieval corpus is actually served at — chunk granularity, with
    * cross-document boilerplate chunks collapsed to one postings entry
    * (CDC's edit-stable identities are what make the dedup effective
    * across near-identical documents).
    *
    * Scale shape: chunking is scan-fused per-row HOFs (one row per
    * chunk); the dedup is one fp-keyed window; BM25 reuses the
    * one-materialized-tf plan. The only corpus-scale shuffles are the
    * fp window and the tf aggregation — both keyed, both map-side
    * combined. */
  def chunkIndexAssembly(s: SparkSession, dir: String, k: Int = 10)
      : DataFrame = {
    val chunks = TextAnalysis.cdcChunkText(Tables.documents(s, dir))
      .select(
        (col("doc_id") * lit(ChunkIdStride) + col("chunk_idx"))
          .as("doc_id"),
        col("chunk_text").as("text"))
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val kept = chunks.withColumn("fp", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "text")
    bm25(kept, Queries, k)
  }
}
