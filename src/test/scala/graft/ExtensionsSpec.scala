package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the native expressions must be callable from SQL. */
class ExtensionsSpec extends AnyFunSuite {

  test("native functions are registered and usable via spark.sql") {
    // force the shared session/context up first, then build a second
    // session over the same context with the extensions applied
    val base = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(dot === 11.0)

      val sig = spark.sql(
        "SELECT minhash_signature('hello world hello', 5, 8) AS s")
        .collect()(0).getSeq[Long](0)
      assert(sig.length === 8)

      val sh = spark.sql(
        "SELECT simhash_features(array('a b', 'b c', 'a b'), 62) AS h")
        .collect()(0).getLong(0)
      assert(sh >= 0L)

      // the Scala escapes decode before SQL parsing: the literal reaching
      // the parser is the DECOMPOSED e + U+0301, the result precomposed
      val nfc = spark.sql(
        "SELECT nfc_normalize('cafe\u0301') AS t")
        .collect()(0).getString(0)
      assert(nfc === "caf\u00e9")

      val zo = spark.sql("SELECT interleave_bits(5, 9) AS z")
        .collect()(0).getLong(0)
      assert(zo === 147L)

      val dr = spark.sql(
        "SELECT deflate_ratio(repeat('ab', 1000)) AS r")
        .collect()(0).getLong(0)
      assert(dr > 0L && dr < 50000L, s"repetition should compress: $dr")

      // bad arity / non-literal args produce analysis errors, not crashes
      val err = intercept[Exception] {
        spark.sql("SELECT minhash_signature('x', 'not-an-int', 8)").collect()
      }
      assert(err.getMessage.toLowerCase.contains("integer literal"))

      // optimizer rule: the idiomatic HOF dot product is rewritten to the
      // native DotProduct, with identical values and null semantics
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val df = Seq(
        (Array(1.0, 2.0), Array(3.0, 4.0)),       // 11.0
        (Array(1.0, 2.0), Array(3.0, 4.0, 5.0)))  // unequal length → null
        .toDF("a", "b")
      val hof = df.select(
        graft.functions.VectorFunctions.dot(col("a"), col("b")).as("d"))
      val rows = hof.collect()
      assert(rows(0).getDouble(0) === 11.0)
      assert(rows(1).isNullAt(0))
      // plan-shape check needs a non-local relation (ConvertToLocalRelation
      // pre-evaluates local data before the plan can be inspected)
      val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select(graft.functions.VectorFunctions.toDoubleVec(col("embedding"))
          .as("v"))
      val onParquet = e.select(
        graft.functions.VectorFunctions.dot(col("v"), col("v")).as("d"))
      assert(onParquet.queryExecution.optimizedPlan.toString
        .contains("dotproduct"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
