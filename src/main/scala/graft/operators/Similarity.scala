package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `knnBruteForce`: exact cosine top-k — the correctness baseline.
  *    The (small) query set is broadcast against the corpus, so the scan
  *    is one pass, no shuffle of the corpus side; per-partition top-k via
  *    window rank on a bounded candidate set.
  *  - `knnLsh`: random-hyperplane LSH — the 100 TB path. Signatures are
  *    64 sign bits of hyperplane dot products; candidates must share one
  *    of the banded signature chunks (bucket equi-join, no cross join).
  *    Hyperplane components are pseudo-random ±1 derived from xxhash64
  *    (seeded, deterministic, no driver-side randomness to ship).
  */
object Similarity {

  /** Deterministic ±1 hyperplane component for (plane p, dim j). */
  private def planeComponent(p: Column, j: Column): Column =
    when(xxhash64(p, j).bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))

  /** Sign bit of plane p · vec (vec is array<double>). */
  private def planeBit(vec: Column, p: Column): Column = {
    val products = zip_with(
      vec,
      transform(vec, (_, j) => j), // index array 0..d-1
      (x, j) => x * planeComponent(p, j))
    when(aggregate(products, lit(0.0), (acc, x) => acc + x) > 0, lit(1L))
      .otherwise(lit(0L))
  }

  /** nBits-wide LSH signature as an array of 0/1 longs. */
  def lshSignature(vec: Column, nBits: Int): Column =
    transform(sequence(lit(0), lit(nBits - 1)), p => planeBit(vec, p))

  /** Exact cosine top-k neighbors for each query vector (broadcast).
    * Norms precomputed per side; per-pair dot is the codegen'd native
    * expression (graft.functions.VectorExpressions). */
  def knnBruteForce(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorExpressions.dot_native
    def side(df: DataFrame, id: String, v: String, n: String) =
      df.select(col("vec_id").as(id), toDoubleVec(col("embedding")).as(v))
        .withColumn(n, sqrt(dot_native(col(v), col(v))))
    val corpus = side(emb, "nn_id", "vc", "nc")
    val q = side(queries, "query_id", "vq", "nq")
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("nn_id"))
    corpus.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .withColumn("sim",
        round(dot_native(col("vq"), col("vc")) / (col("nq") * col("nc")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("nn_id"), col("sim"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** IVF (inverted-file) ANN: partition the corpus into C cells around
    * centroids, search only the `nprobe` cells nearest each query.
    *
    * Centroids: C corpus vectors picked by deterministic hash of vec_id
    * (reservoir-free, reproducible), refined with one Lloyd step (mean of
    * assigned vectors) — the classic IVF training loop collapsed to its
    * minimum; production runs more refinement passes offline and stores
    * the cell assignment as a partition column so a probe reads only
    * nprobe partitions. Candidates = vectors in probed cells, exact
    * cosine re-rank on candidates. All joins against centroids are
    * broadcast (C is small by construction); the corpus is never
    * cross-joined.
    */
  def knnIvf(emb: DataFrame, queries: DataFrame, k: Int,
             cells: Int = 16, nprobe: Int = 4): DataFrame = {
    import graft.functions.VectorExpressions.dot_native
    val e = emb.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    // seed centroids: smallest hash per cell-slot bucket, then 1 Lloyd step
    val seeds = e.withColumn("slot", pmod(xxhash64(col("vec_id")), lit(cells)))
      .withColumn("rk", row_number().over(
        Window.partitionBy("slot").orderBy(xxhash64(col("vec_id"), lit(7)))))
      .filter(col("rk") === 1)
      .select(col("slot").as("cell"), col("v").as("cv"))
    def nearestCell(frame: DataFrame, cents: DataFrame, outCol: String) =
      frame.crossJoin(broadcast(cents))
        .withColumn("d", dot_native(col("v"), col("cv")) /
          (sqrt(dot_native(col("v"), col("v"))) *
           sqrt(dot_native(col("cv"), col("cv")))))
        .withColumn("rk", row_number().over(
          Window.partitionBy("vec_id").orderBy(desc("d"), asc("cell"))))
        .filter(col("rk") <= 1)
        .select(frame.columns.map(col) :+ col("cell").as(outCol): _*)
    val assigned0 = nearestCell(e, seeds, "cell0")
    val refined = assigned0.groupBy(col("cell0").as("cell"))
      .agg(array((0 until 64).map(i =>
        avg(element_at(col("v"), i + 1))): _*).as("cv"))
    val assigned = nearestCell(e, refined, "cell")
    // probe: nprobe nearest refined centroids per query
    val q = queries.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val probes = q.crossJoin(broadcast(refined))
      .withColumn("d", dot_native(col("v"), col("cv")) /
        (sqrt(dot_native(col("v"), col("v"))) *
         sqrt(dot_native(col("cv"), col("cv")))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("d"), asc("cell"))))
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("vq"), col("cell"))
    val cand = probes.join(
        assigned.select(col("vec_id").as("nn_id"), col("v").as("vc"),
          col("cell")),
        Seq("cell"))
      .filter(col("query_id") =!= col("nn_id"))
      .select("query_id", "vq", "nn_id", "vc").distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("nn_id"))
    cand
      .withColumn("sim", round(dot_native(col("vq"), col("vc")) /
        (sqrt(dot_native(col("vq"), col("vq"))) *
         sqrt(dot_native(col("vc"), col("vc")))), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("nn_id"), col("sim"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** ANN top-k via banded LSH buckets; recall depends on nBits/bands.
    * Candidates = corpus vectors sharing ≥1 signature band with the
    * query; exact cosine re-rank on that bounded set. */
  def knnLsh(emb: DataFrame, queries: DataFrame, k: Int,
             nBits: Int = 16, bands: Int = 4): DataFrame = {
    require(nBits % bands == 0)
    val r = nBits / bands
    def banded(df: DataFrame, idCol: String, vecCol: String) =
      df.select(col("vec_id").as(idCol),
          toDoubleVec(col("embedding")).as(vecCol))
        .withColumn("sig", lshSignature(col(vecCol), nBits))
        .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
        .withColumn("band_key",
          xxhash64(col("band"), expr(s"slice(sig, band * $r + 1, $r)")))
        .drop("sig")
    val corpus = banded(emb, "nn_id", "vc")
      .withColumnsRenamed(Map("band" -> "c_band", "band_key" -> "c_key"))
    val q = banded(queries, "query_id", "vq")
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("nn_id"))
    corpus.join(broadcast(q),
        col("c_band") === col("band") && col("c_key") === col("band_key") &&
        col("query_id") =!= col("nn_id"))
      .select("query_id", "vq", "nn_id", "vc").distinct()
      .withColumn("sim", round(
        graft.functions.VectorExpressions.cosine_native(
          col("vq"), col("vc")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("nn_id"), col("sim"), col("rn"))
      .orderBy("query_id", "rn")
  }
}
