package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("perceptron separates the planted classes above the gate floor") {
    val pred = QualityClassifier.qualityPerceptron(spark, dir)
      .select("label", "pred").as[(Long, Long)].collect()
    assert(pred.nonEmpty)
    val acc = pred.count(p => p._1 == p._2).toDouble / pred.length
    assert(acc >= 0.95, s"accuracy $acc below the 0.95 gate floor")
    // both classes actually present (the plant is 1/3 junk)
    assert(pred.count(_._1 == -1L) > 0 && pred.count(_._1 == 1L) > 0)
  }

  test("training is deterministic: two runs give identical weights") {
    val feats = QualityClassifier.perceptronFeatures(
      graft.sources.Tables.documents(spark, dir)).localCheckpoint(true)
    val w1 = QualityClassifier.trainPerceptron(feats)
    val w2 = QualityClassifier.trainPerceptron(feats)
    assert(w1 === w2)
    // driver-metadata-sized model: at most D+1 weights
    assert(w1.size <= QualityClassifier.D + 1)
  }

  test("gate reports the accuracy the predictions imply") {
    val g = QualityClassifier.qualityPerceptronGate(spark, dir)
      .as[(Long, Long, Int)].head()
    assert(g._1 === 500L)
    assert(g._3 === 1, s"gate red: ${g._2}/${g._1} correct")
  }

  test("survives empty and one-row corpora") {
    for (docs <- Seq(
        Seq.empty[(Long, String, String, String, Long)]
          .toDF("doc_id", "text", "lang", "source", "n_chars"),
        Seq((1L, "tiny", "en", "t", 4L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"))) {
      val tmp = java.nio.file.Files.createTempDirectory("graft-qc").toString
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = QualityClassifier.qualityPerceptron(spark, tmp)
      assert(out.count() === docs.count())
    }
  }
}
