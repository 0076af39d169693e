package graft

import graft.multimodal.Multimodal
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)
  private def media = Multimodal.mediaFromDocuments(docs)

  test("planted perceptual twins stay within half the gate's Hamming budget") {
    val sigs = Multimodal.perceptualSigs(
        media.unionByName(Multimodal.plantedPerceptualDups(media)))
      .as[(Long, String, Long)].collect()
      .map { case (id, m, sh) => id -> (m, sh) }.toMap
    val plantedIds = sigs.keys.filter(_ >= Multimodal.PlantIdOffset)
    assert(plantedIds.nonEmpty)
    val dists = plantedIds.toSeq.map { twin =>
      val orig = twin - Multimodal.PlantIdOffset
      val d = java.lang.Long.bitCount(sigs(orig)._2 ^ sigs(twin)._2)
      (sigs(orig)._1, d)
    }
    // +2 brightness never saturates on UTF-8-derived rasters, so the
    // image signature is exactly invariant; audio/video drift is from
    // truncation/clipping ties only. The gate runs at maxDist=6 — twins
    // must sit at <= 3 so corpus drift has 2x margin before a red gate.
    assert(dists.filter(_._1 == "image").forall(_._2 == 0),
      s"image twins moved: ${dists.filter(_._1 == "image").filter(_._2 > 0)}")
    assert(dists.forall(_._2 <= 3), s"twins past margin: ${dists.filter(_._2 > 3)}")
  }

  test("near-dup gate recovers exactly the planted pair formula") {
    val got = Multimodal.nearDupGate(docs, maxDist = 6)
      .as[(Long, Long)].collect().toSet
    val want = docs.select("doc_id").as[Long].collect()
      .filter(id => Math.floorMod(id, Multimodal.PlantEvery.toLong) == 0L)
      .map(id => (id, id + Multimodal.PlantIdOffset)).toSet
    assert(got === want)
  }

  test("pairs never cross modalities, even with identical signatures") {
    val sigs = Seq(
      (1L, "image", 42L), (2L, "audio", 42L), (3L, "video", 42L),
      (4L, "image", 42L)
    ).toDF("doc_id", "modality", "sh")
    val pairs = Dedup.simhashPairsFromSig(sigs, maxDist = 6,
        groupCols = Seq("modality"))
      .as[(Long, Long, String, Int)].collect()
    assert(pairs.toSet === Set((1L, 4L, "image", 0)))
  }

  test("rep-level pair volume stays linear despite exact-dup classes") {
    val all = media.unionByName(Multimodal.plantedPerceptualDups(media))
    val nPairs = Multimodal.nearDupPairs(all, Multimodal.GateMaxDist).count()
    val nRows = all.count()
    // the audio fixture collapses to ~34 envelope classes (5k+ raw
    // pairs); collapsing exact-signature classes to representatives
    // first must keep the emitted pair set linear in the corpus
    assert(nPairs < nRows, s"$nPairs pairs from $nRows rows")
    val groups = Multimodal.sigGroups(all)
    // grouping is lossless: class sizes re-add to the corpus
    assert(groups.agg(sum("n_rows")).as[Long].head() === nRows)
  }
}
