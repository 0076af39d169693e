package graft

import graft.sources.{IndexStore, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract corners of the serving manifest the composed
  * index_manifest_gate doesn't exercise: losing a commit race, time
  * travel across mutations, file-level pruned reads, idempotent
  * forget, and a retention window wider than 1. */
class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  private def freshRoot(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_store_spec_")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def fp(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = df.agg(count(lit(1)),
      sum(xxhash64(col("nn_id"), col("cell"), col("codes"))
        .cast("decimal(38,0)"))).head()
    (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
  }

  test("build + open round-trips models and codes; version log is v1") {
    val root = freshRoot()
    val v1 = IndexStore.build(spark, root, emb)
    assert(v1.version === 1L && v1.op === "build")
    assert(IndexStore.versions(spark, root) === Seq(1L))
    val reopened = IndexStore.open(spark, root)
    // parquet double round trip is exact — models reproduce bit-for-bit
    assert(reopened.cents.map(_.toSeq).toSeq === v1.cents.map(_.toSeq).toSeq)
    assert(reopened.cb.map(_.map(_.toSeq).toSeq).toSeq ===
      v1.cb.map(_.map(_.toSeq).toSeq).toSeq)
    assert(fp(IndexStore.codes(spark, root, reopened))._1 === emb.count())
  }

  test("second build of an initialized store loses the v1 commit race") {
    val root = freshRoot()
    IndexStore.build(spark, root, emb.filter(col("vec_id") < 400))
    val e = intercept[IllegalArgumentException] {
      IndexStore.build(spark, root, emb)
    }
    assert(e.getMessage.contains("already initialized"))
    // the loser's episode garbage never corrupts the live snapshot
    val live = IndexStore.open(spark, root)
    assert(live.version === 1L)
    assert(fp(IndexStore.codes(spark, root, live))._1 ===
      emb.filter(col("vec_id") < 400).count())
  }

  test("time travel: every version reproduces its publish-time content") {
    val root = freshRoot()
    val base = emb.filter(col("vec_id") < 400)
    val inc = emb.filter(col("vec_id") >= 400)
    val v1 = IndexStore.build(spark, root, base)
    val f1 = fp(IndexStore.codes(spark, root, v1))
    val v2 = IndexStore.append(spark, root, inc)
    val f2 = fp(IndexStore.codes(spark, root, v2))
    val v3 = IndexStore.compact(spark, root)
    assert(fp(IndexStore.codes(spark, root, v3)) === f2)
    // pinned readers of superseded versions are intact
    assert(fp(IndexStore.codes(spark, root,
      IndexStore.openVersion(spark, root, 1L))) === f1)
    assert(fp(IndexStore.codes(spark, root,
      IndexStore.openVersion(spark, root, 2L))) === f2)
    assert(IndexStore.versions(spark, root) === Seq(1L, 2L, 3L))
  }

  test("codesForCells reads exactly the wanted cells' rows") {
    val root = freshRoot()
    val v1 = IndexStore.build(spark, root, emb)
    val all = IndexStore.codes(spark, root, v1)
    val twoCells = all.select("cell").distinct().orderBy("cell")
      .limit(2).collect().map(_.getInt(0)).toSet
    val pruned = IndexStore.codesForCells(spark, root, v1, twoCells)
    assert(pruned.select("cell").distinct().collect()
      .map(_.getInt(0)).toSet === twoCells)
    assert(pruned.count() ===
      all.filter(col("cell").isin(twoCells.toSeq: _*)).count())
    // and the pruned read opened strictly fewer files than the snapshot
    assert(v1.fileCells.count(twoCells) < v1.files.size)
  }

  test("forget is idempotent: re-forgetting absent ids rewrites nothing") {
    val root = freshRoot()
    IndexStore.build(spark, root, emb)
    val doomed = emb.filter(col("vec_id") % 97 === 0).select("vec_id")
    val v2 = IndexStore.forget(spark, root, doomed)
    val f2 = fp(IndexStore.codes(spark, root, v2))
    val v3 = IndexStore.forget(spark, root, doomed)
    // no doomed cells the second time → the file list is INHERITED
    assert(v3.files === v2.files)
    assert(fp(IndexStore.codes(spark, root, v3)) === f2)
    assert(v3.nRows === v2.nRows)
  }

  test("vacuum honors the retention window, then tightens to live") {
    val root = freshRoot()
    val base = emb.filter(col("vec_id") < 400)
    IndexStore.build(spark, root, base)
    IndexStore.append(spark, root, emb.filter(col("vec_id") >= 400))
    val v3 = IndexStore.compact(spark, root)
    val f3 = fp(IndexStore.codes(spark, root, v3))
    // retain 2: v2 and v3 — v2's files include v1's (append shares),
    // so the v2 pinned reader must survive this vacuum
    IndexStore.vacuum(spark, root, retainLast = 2)
    val f2 = fp(IndexStore.codes(spark, root,
      IndexStore.openVersion(spark, root, 2L)))
    assert(f2._1 === emb.count())
    // retain 1: only v3's swapped file set remains
    val (removed, _) = IndexStore.vacuum(spark, root, retainLast = 1)
    assert(removed > 0L)
    assert(fp(IndexStore.codes(spark, root,
      IndexStore.open(spark, root))) === f3)
  }
}
