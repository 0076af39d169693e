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

      // bad arity / non-literal args produce analysis errors, not crashes
      val err = intercept[Exception] {
        spark.sql("SELECT minhash_signature('x', 'not-an-int', 8)").collect()
      }
      assert(err.getMessage.toLowerCase.contains("integer literal"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
