package graft

import graft.functions.{MinHashExpression, SimHashExpression, VectorExpressions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native-expression correctness: the codegen'd fast paths must produce
  * exactly the values of their composed (interpreted) formulations. */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dot_native matches the higher-order-function dot, bit for bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)))
      .toDF("a", "b")
      .select(VectorFunctions.toDoubleVec(col("a")).as("a"),
              VectorFunctions.toDoubleVec(col("b")).as("b"))
    val hof = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect()
    val native = df.select(VectorExpressions.dot_native(col("a"), col("b")))
      .as[Double].collect()
    assert(hof.toSeq === native.toSeq)
    assert(hof(0) === 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
  }

  test("dot_native survives both codegen and interpreted evaluation") {
    val df = Seq((Array(2.0, 4.0), Array(3.0, 5.0))).toDF("a", "b")
    // interpreted path (eval): wrap in a situation codegen handles anyway;
    // directly exercise nullSafeEval through a filter on the value
    val v = df.select(VectorExpressions.dot_native(col("a"), col("b")).as("d"))
      .filter(col("d") > 0).as[Double].collect()
    assert(v.toSeq === Seq(26.0))
    // null propagation
    val n = df.select(VectorExpressions.dot_native(
      lit(null).cast("array<double>"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("minhash signature: deterministic, k-wide, equal for equal text") {
    val df = Seq("abcdefghij", "abcdefghij", "zzzzzzzzzz").toDF("text")
      .select(MinHashExpression.minhash_signature(col("text"), 5, 16).as("sig"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length === 16)
    assert(rows(0) === rows(1))
    assert(rows(0) !== rows(2))
  }

  test("minhash estimated jaccard tracks true overlap") {
    // two long strings sharing ~90% of their content
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val near = (1 to 180).map(i => s"tok$i").mkString(" ") + " " +
      (900 to 919).map(i => s"tok$i").mkString(" ")
    val far = (500 to 700).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
      .select(col("doc_id"),
        MinHashExpression.minhash_signature(col("text"), 5, 64).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(sigs(1L), sigs(2L)) > 0.5)
    assert(est(sigs(1L), sigs(3L)) < 0.3)
  }

  test("lsh_sign_bits: packed sign bits match a driver-side recomputation") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    // component magnitudes chosen so no ± combination sums to exactly 0:
    // every plane sum is nonzero, making the negated vector's signature
    // the exact bit complement
    val vecs = Seq(
      Array(0.3, -1.3, 4.1, 0.7, 2.5),
      Array(-0.3, 1.3, -4.1, -0.7, -2.5), // negation flips every sign
      Array(1e-9, 1e-9))
    val nBits = 16
    def expected(v: Array[Double]): Long = {
      val acc = new Array[Double](nBits)
      for (j <- v.indices; p <- 0 until nBits)
        acc(p) += (if ((XXH64.hashLong(j.toLong, p.toLong) & 1L) == 1L) v(j)
                   else -v(j))
      (0 until nBits).foldLeft(0L)((s, p) =>
        if (acc(p) > 0) s | (1L << p) else s)
    }
    val got = vecs.toDF("v")
      .select(graft.functions.LshExpression.lsh_sign_bits(col("v"), nBits))
      .as[Long].collect()
    assert(got.toSeq === vecs.map(expected))
    // negation is the exact bit complement within the low nBits
    assert((got(0) ^ got(1)) === (1L << nBits) - 1)
    // null element and null array both yield null
    val df = Seq((Array(1.0, 2.0), 1)).toDF("v", "i")
    assert(df.select(graft.functions.LshExpression.lsh_sign_bits(
      lit(null).cast("array<double>"), nBits)).collect()(0).isNullAt(0))
    assert(df.select(graft.functions.LshExpression.lsh_sign_bits(
      array(lit(1.0), lit(null).cast("double")), nBits))
      .collect()(0).isNullAt(0))
  }

  test("simhash: zero distance for identical, small for near-identical") {
    val toks = graft.functions.TextFunctions
    def sh(s: String): Long =
      Seq(s).toDF("text").select(SimHashExpression.simhash_features(
        toks.wordNgrams(toks.tokenize(col("text")), 2), 62)).as[Long]
        .collect()(0)
    val a = (1 to 100).map(i => s"w$i").mkString(" ")
    val b = (2 to 100).map(i => s"w$i").mkString(" ") // one token dropped
    assert(sh(a) === sh(a))
    val dist = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(dist > 0 && dist <= 10)
    assert(sh(a) >= 0L) // 62-bit packing keeps ANSI-long-safe positive
  }

  test("deflate_ratio: repetition compresses, prose doesn't, null-safe") {
    import graft.functions.DeflateExpression.deflate_ratio
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders off across seventeen unpredictable meadows 42 91 7"
    val df = Seq(
      ("a" * 2000, "rep"),
      (prose * 20, "template"),
      (prose, "prose"),
      ("", "empty"))
      .toDF("text", "kind")
    val r = df.select(col("kind"), deflate_ratio(col("text")).as("r"))
      .as[(String, Long)].collect().toMap
    assert(r("rep") < 50000L, s"pure repetition: ${r("rep")}")
    assert(r("template") * 2 < r("prose"),
      s"20x template ${r("template")} vs prose ${r("prose")}")
    assert(r("prose") > 200000L && r("prose") <= 1500000L)
    assert(r("empty") === 1000000L)
    // deterministic across evaluations
    val again = df.select(deflate_ratio(col("text")).as("r"))
      .as[Long].collect().sorted
    assert(again.toSeq === r.values.toSeq.sorted)
    // null propagation (interpreted path via filter)
    val n = df.limit(1).select(
      deflate_ratio(lit(null).cast("string"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("compression ratio gate pins the planted-repeat invariants") {
    import graft.operators.TextAnalysis
    val row = TextAnalysis.compressionRatioGate(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].head()
    assert(row === ((520L, 10L, 1L, 1L)))
  }

  test("nfc_normalize: NFD composes to NFC, NFC passes through, null-safe") {
    import graft.functions.NormalizeExpression.nfc_normalize
    val nfd = "cafe\u0301"   // e + combining acute (5 code points)
    val nfc = "caf\u00e9"    // precomposed e-acute (4 code points)
    val df = Seq(Some(nfd), Some(nfc), Some("plain ascii"), None)
      .toDF("text")
    val got = df.select(nfc_normalize(col("text"))).as[Option[String]]
      .collect().toSeq
    assert(got === Seq(Some(nfc), Some(nfc), Some("plain ascii"), None))
    // idempotent; char counts shrink across composition
    val lens = df.filter(col("text").isNotNull).select(
      length(col("text")),
      length(nfc_normalize(col("text"))),
      length(nfc_normalize(nfc_normalize(col("text")))))
      .as[(Int, Int, Int)].collect()
    assert(lens.toSeq === Seq((5, 4, 4), (4, 4, 4), (11, 11, 11)))
  }

  test("nfc_normalize survives both codegen and interpreted evaluation") {
    import graft.functions.NormalizeExpression.nfc_normalize
    val df = Seq("a\u0301b\u0301", "x", "ascii only").toDF("text")
    def run(codegen: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(nfc_normalize(col("text"))).as[String].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    assert(cg === run("NO_CODEGEN"))
    // a+acute composes to U+00E1; b+acute has no precomposed form and
    // stays decomposed (U+0062 U+0301) — NFC is not "strip the marks"
    assert(cg === Seq("\u00e1b\u0301", "x", "ascii only"))
  }

  test("bpe_merge_pair: greedy left-to-right, non-overlapping") {
    import graft.functions.BpeMergeExpression.bpe_merge_pair
    val df = Seq(
      Seq("a", "a", "a"),        // greedy: first pair merges, third stays
      Seq("a", "b", "a", "b"),   // both pairs merge
      Seq("x"),                  // too short
      Seq("b", "a")              // wrong order: untouched
    ).toDF("s")
    val got = df.select(bpe_merge_pair(col("s"), "a", "a")).as[Seq[String]]
      .collect()(0)
    assert(got === Seq("aa", "a"))
    val ab = df.select(bpe_merge_pair(col("s"), "a", "b")).as[Seq[String]]
      .collect().toSeq
    assert(ab === Seq(Seq("a", "a", "a"), Seq("ab", "ab"), Seq("x"),
      Seq("b", "a")))
  }

  test("char_window_hashes equals xxhash64 over substr windows, incl. multibyte") {
    import graft.functions.CharWindowExpression.char_window_hashes
    // multibyte chars make byte offsets diverge from char offsets — the
    // boundary walk must stay char-aligned
    val df = Seq("hello world", "aéb中文c", "ab", "").toDF("text")
    def composed(n: Int) =
      when(length(col("text")) < n, array().cast("array<bigint>"))
        .otherwise(transform(
          sequence(lit(1), length(col("text")) - lit(n - 1)),
          i => xxhash64(col("text").substr(i, lit(n)))))
    for (n <- Seq(2, 3, 5)) {
      val native = df.select(char_window_hashes(col("text"), n))
        .as[Seq[Long]].collect().toSeq
      val ref = df.select(composed(n)).as[Seq[Long]].collect().toSeq
      assert(native === ref, s"n=$n")
    }
    // null propagates
    assert(df.limit(1).select(char_window_hashes(
      lit(null).cast("string"), 3)).collect()(0).isNullAt(0))
  }

  test("sig_agree_count equals the composed zip_with form") {
    import graft.functions.MinHashExpression.sig_agree_count
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 8L)), // 2 agree
      (Array(5L, 5L), Array(5L, 5L)),                 // all agree
      (Array(1L, 2L, 3L), Array(7L, 8L)),             // prefix only, 0
      (Array.empty[Long], Array(1L))                  // empty → 0
    ).toDF("a", "b")
    val got = df.select(sig_agree_count(col("a"), col("b"))).as[Long].collect()
    val ref = df.select(size(filter(zip_with(col("a"), col("b"),
      (x, y) => x === y), p => p)).cast("long")).as[Long].collect()
    assert(got.toSeq === Seq(2L, 2L, 0L, 0L))
    assert(got.toSeq === ref.toSeq)
  }
}
