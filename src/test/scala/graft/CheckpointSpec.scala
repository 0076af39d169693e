package graft

import graft.operators.{Checkpoints, Dedup, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reliable-checkpoint knob (spark.graft.checkpointDir): iterative
  * operators must produce BYTE-IDENTICAL results whether each round
  * lands in executor-local blocks (default) or on the shared filesystem
  * (cluster deployment, executor-loss tolerant). The knob is a runtime
  * conf, so the same operator code serves both — this spec runs the
  * three iterative families both ways and diffs exactly.
  */
class CheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withReliableDir[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try body
    finally spark.conf.unset(Checkpoints.DirKey)
  }

  // a 2-component graph with a chain (forces >1 propagation round)
  private lazy val pairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (11L, 12L)).toDF("id_a", "id_b")

  test("connected components (label-prop) identical under reliable checkpoint") {
    val local = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().sorted
    val reliable = withReliableDir {
      Dedup.connectedComponents(pairs).as[(Long, Long)].collect().sorted
    }
    assert(reliable === local)
    assert(local.map(_._2).distinct.sorted === Array(1L, 10L))
  }

  test("connected components (star) identical under reliable checkpoint") {
    val local = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().sorted
    val reliable = withReliableDir {
      Dedup.connectedComponentsStar(pairs).as[(Long, Long)].collect().sorted
    }
    assert(reliable === local)
  }

  test("pageRank identical under reliable checkpoint") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L),
      (1L, 3L)).toDF("src", "dst")
    val local = Graph.pageRank(edges, 5).as[(Long, Long)].collect().sorted
    val reliable = withReliableDir {
      Graph.pageRank(edges, 5).as[(Long, Long)].collect().sorted
    }
    assert(reliable === local)
  }

  test("superseded reliable rounds are reclaimed; the live round survives") {
    // the chain graph forces multiple star rounds; without dropRound the
    // dir would hold one rdd-N snapshot per round forever (the 100 TB
    // leak the r9 review flagged) — after the run only the final round
    // may remain
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt3").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val out = Dedup.connectedComponentsStar(pairs)
        .as[(Long, Long)].collect().sorted
      assert(out.nonEmpty)
      val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(rddDirs >= 1, "the final round's files must survive")
      assert(rddDirs <= 2, s"stale checkpoint rounds not reclaimed: $rddDirs")
    } finally spark.conf.unset(Checkpoints.DirKey)
  }

  test("kill-resume: a restarted componentsStar run resumes from round files") {
    // The driver-restart story (VERDICT r9 #5): under
    // spark.graft.resumeDir every round snapshots to parquet; a run
    // killed mid-iteration leaves the last complete round on disk, and
    // the next invocation seeds from it instead of recomputing.
    // A 16-node chain needs several star rounds, so maxIter=1 aborts
    // mid-run — the require throw stands in for the kill (same effect:
    // the loop dies after round 1 with round files on disk).
    val chain = (1L until 16L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val expected = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect().sorted
    val dir = java.nio.file.Files.createTempDirectory("graft-resume").toString
    spark.conf.set(Checkpoints.ResumeKey, dir)
    try {
      intercept[IllegalArgumentException] {
        Dedup.connectedComponentsStar(chain, maxIter = 1).collect()
      }
      val root = java.nio.file.Paths.get(dir, "components_star")
      assert(java.nio.file.Files.exists(root),
        "the killed run left no round snapshots")
      // The resumed call gets an EMPTY pair set: if it cold-recomputed
      // from its input the result would be empty, so reproducing the
      // chain's fixpoint PROVES the round-1 files seeded the run.
      val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
      val resumed = Dedup.connectedComponentsStar(empty)
        .as[(Long, Long)].collect().sorted
      assert(resumed === expected,
        "resumed run did not reach the killed run's fixpoint")
      // success clears the store — a stale fixpoint must never seed a
      // later run over different input
      assert(!java.nio.file.Files.exists(root),
        "resume store not cleared after successful convergence")
    } finally spark.conf.unset(Checkpoints.ResumeKey)
  }

  test("kill-resume: pageRank resumes from a planted rank round") {
    // pageRank has no abort path to simulate a kill with, so exercise
    // the primitive directly: plant a fabricated round-<iters> rank
    // table in the store — the resumed run's sweep counter starts at
    // iters, the loop never executes, and the planted ranks ARE the
    // result, which only the store could have produced.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft-resumePR").toString
    spark.conf.set(Checkpoints.ResumeKey, dir)
    try {
      val planted = Seq((1L, 1L, 111L), (2L, 1L, 222L), (3L, 1L, 333L))
        .toDF("node", "outdeg", "pr")
      Checkpoints.saveRound(planted, "pagerank", 5)
      val out = Graph.pageRank(edges, 5).as[(Long, Long)].collect().sorted
      assert(out === Array((1L, 111L), (2L, 222L), (3L, 333L)))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "pagerank")),
        "store not cleared after completion")
    } finally spark.conf.unset(Checkpoints.ResumeKey)
  }

  test("kill-resume: label-prop components resume from planted labels") {
    // Min-label propagation only ever lowers labels, so a planted -1
    // label (absent from any real input) surviving to the output proves
    // the round store seeded the run, not a cold recompute.
    val dir = java.nio.file.Files.createTempDirectory("graft-resumeLP").toString
    spark.conf.set(Checkpoints.ResumeKey, dir)
    try {
      val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L)
      val planted = nodes.map(n => (n, -1L)).toDF("id", "comp")
      Checkpoints.saveRound(planted, "components_labelprop", 1)
      val out = Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect()
      assert(out.nonEmpty && out.forall(_._2 === -1L),
        s"resumed labels lost the planted sentinel: ${out.take(3).toSeq}")
    } finally spark.conf.unset(Checkpoints.ResumeKey)
  }

  test("kill-resume: BPE training resumes from a planted merge round") {
    // The BPE round state is the merge table itself; a fabricated
    // control-char merge (impossible to learn from real text) leading
    // the trained table proves the store was replayed. trainBpe is
    // called directly to bypass the (dir, nMerges) memo cache.
    val dir = java.nio.file.Files.createTempDirectory("graft-resumeBPE").toString
    spark.conf.set(Checkpoints.ResumeKey, dir)
    try {
      val planted = Seq((0, "\u0001", "\u0002", 999L))
        .toDF("step", "pair_a", "pair_b", "pair_count")
      Checkpoints.saveRound(planted, "bpe_merges", 1)
      val out = graft.operators.TextAnalysis
        .trainBpe(spark, "/root/testdata/sf0.001", 3)
      assert(out.size === 3)
      assert(out.head === ((0, "\u0001", "\u0002", 999L)),
        "planted merge not replayed from the store")
      assert(out.map(_._1) === Seq(0, 1, 2))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "bpe_merges")),
        "store not cleared after completion")
    } finally spark.conf.unset(Checkpoints.ResumeKey)
  }

  test("kill-resume: unigram training resumes from a planted piece round") {
    // The unigram round state is the (piece, count) inventory; a
    // control-char sentinel piece (unseedable from real text, and a
    // single char so the pruner can never drop it) surviving into the
    // trained inventory proves the store seeded the run. trainUnigram
    // is called directly to bypass the (dir, target) memo cache.
    val dir = java.nio.file.Files.createTempDirectory("graft-resumeUG").toString
    spark.conf.set(Checkpoints.ResumeKey, dir)
    try {
      val planted = Seq(("\u0001", 5L)).toDF("piece", "c")
      Checkpoints.saveRound(planted, "unigram_pieces", 0)
      val (pieces, _, _) = graft.operators.TextAnalysis
        .trainUnigram(spark, "/root/testdata/sf0.001", 200)
      assert(pieces.map(_._1) === Seq("\u0001"),
        "planted inventory not replayed from the store")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "unigram_pieces")),
        "store not cleared after completion")
    } finally spark.conf.unset(Checkpoints.ResumeKey)
  }

  test("kill-resume: nn-descent resumes from a planted graph round") {
    // The descent's round state is the k-NN graph itself; plant a
    // fabricated final round (sim = -9 is impossible for a cosine, so
    // only the store could have produced it) at round = iters — the
    // resumed run's descent loop never executes and the planted graph,
    // truncated to k, IS the result.
    val dir = java.nio.file.Files.createTempDirectory("graft-resumeNND").toString
    spark.conf.set(Checkpoints.ResumeKey, dir)
    try {
      val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val planted = Seq((7L, 8L, -9.0d, 1), (7L, 9L, -9.0d, 11))
        .toDF("query_id", "nn_id", "sim", "rn")
      // the store is namespaced per (corpus, params) build — plant
      // under the exact op name the default-parameter build reads
      val op = graft.operators.Similarity.nndescentOpFor(emb)
      Checkpoints.saveRound(planted, op, 5)
      val out = graft.operators.Similarity.knnGraphNnDescent(emb, 10)
        .as[(Long, Long, Double, Int)].collect()
      // the rn=1 sentinel survives the k-truncation; the rn=11 row (in
      // the over-build margin beyond k) is cut by it
      assert(out.toSeq === Seq((7L, 8L, -9.0d, 1)),
        s"planted graph not replayed from the store: ${out.take(3).toSeq}")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, op)),
        "store not cleared after completion")
    } finally spark.conf.unset(Checkpoints.ResumeKey)
  }

  test("kill-resume: a foreign build's nn-descent round is NOT resumed") {
    // r13 ADVICE: the store used ONE fixed op name, so a restart that
    // ran a differently-parameterized graph query first silently
    // resumed from the other build's rounds. With per-build
    // namespacing, a round planted under ANOTHER build's op (here a
    // k=7 build — different over-build width kb) must be invisible to
    // the default k=10 build: no sentinel row may survive.
    val dir = java.nio.file.Files.createTempDirectory("graft-resumeNNDf").toString
    spark.conf.set(Checkpoints.ResumeKey, dir)
    try {
      val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val planted = Seq((7L, 8L, -9.0d, 1))
        .toDF("query_id", "nn_id", "sim", "rn")
      val foreignOp = graft.operators.Similarity.nndescentOpFor(emb, k = 7)
      Checkpoints.saveRound(planted, foreignOp, 5)
      val out = graft.operators.Similarity.knnGraphNnDescent(emb, 10)
        .filter($"sim" < -1.0).count()
      assert(out === 0L,
        "a round from a differently-parameterized build was resumed")
      // the foreign build's rounds are untouched (its own restart may
      // still need them)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, foreignOp)),
        "another build's store was cleared")
    } finally spark.conf.unset(Checkpoints.ResumeKey)
  }

  test("a conf change re-points the context checkpoint dir") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-ckptA").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-ckptB").toString
    def hasRdd(d: String) = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      .filter(p => p.getFileName.toString.startsWith("rdd-")).count() > 0
    spark.conf.set(Checkpoints.DirKey, d1)
    try {
      Dedup.connectedComponentsStar(pairs).collect()
      assert(hasRdd(d1), "first dir never received rounds")
      spark.conf.set(Checkpoints.DirKey, d2)
      Dedup.connectedComponentsStar(pairs).collect()
      assert(hasRdd(d2),
        "conf change ignored — rounds still land in the stale dir")
    } finally spark.conf.unset(Checkpoints.DirKey)
  }

  test("reliable mode actually writes round files to a checkpoint dir") {
    withReliableDir {
      Dedup.connectedComponentsStar(pairs).collect()
      // inspect the dir the context ACTUALLY used (materialize
      // re-points it to this test's conf value — pinned by the
      // re-point test above — and appends a per-context UUID subdir)
      val ctxDir = spark.sparkContext.getCheckpointDir
      assert(ctxDir.isDefined, "reliable run never set a checkpoint dir")
      val files = java.nio.file.Files
        .walk(java.nio.file.Paths.get(new java.net.URI(ctxDir.get).getPath))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no reliable checkpoint files under $ctxDir")
    }
  }
}
