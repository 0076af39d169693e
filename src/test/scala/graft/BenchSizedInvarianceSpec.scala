package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Pins the claim every bench-sized gate invocation rests on: the
  * declared OUTPUT is cell-count-independent, so the gated (benchSized)
  * arm and the corpus-count-policy arm must produce identical rows. A
  * future column that exposes cell geometry (occupancy, file counts,
  * per-cell anything) silently breaks oracle equivalence the moment the
  * bench-sized arm diverges — this test makes that divergence fail
  * loudly (r19 verdict ask #6). manifestRebuildGate is the pinned
  * instance: both model generations provision at the sized cell count,
  * so every column (counts, trigger arms, generation bookkeeping,
  * old-reader isolation, recall flag) must be geometry-free. */
class BenchSizedInvarianceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def rows(benchSized: Boolean): Seq[Seq[Any]] = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsi_").toString
    try
      Similarity.manifestRebuildGate(spark, dir, root,
          benchSized = benchSized)
        .collect().map(_.toSeq).toSeq
    finally {
      val p = java.nio.file.Paths.get(root)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("manifestRebuildGate output is identical bench-sized and policy-sized") {
    val sized = rows(benchSized = true)
    val policy = rows(benchSized = false)
    assert(sized.nonEmpty)
    assert(sized === policy)
    // the comparison is live, not vacuous: a real corpus ran (n > 0)
    // and the drift arm actually fired (rebuild exercised)
    assert(sized.head.head.asInstanceOf[Long] > 0L)
  }
}
