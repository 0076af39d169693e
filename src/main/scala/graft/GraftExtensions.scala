package graft

import graft.functions.{MinHashTextSignature, SimHashFeatures}
import graft.functions.BitmapExpressions.BitmapAndCount
import graft.functions.VectorExpressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration: exposes the native expressions to
  * SQL (`dot_product`, `minhash_signature`, `simhash_features`), so
  * `spark.sql("...")` users get the same codegen'd fast path as the
  * Column API.
  *
  * Wire up with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.functions.RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(
        classOf[graft.functions.NgramExpression.WordNgrams].getName,
        "word_ngrams"),
      (args: Seq[Expression]) =>
        graft.functions.NgramExpression.WordNgrams(args(0),
          intArg(args(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("bitmap_and_count"),
      new ExpressionInfo(classOf[BitmapAndCount].getName, "bitmap_and_count"),
      (args: Seq[Expression]) => BitmapAndCount(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashTextSignature].getName,
        "minhash_signature"),
      (args: Seq[Expression]) => MinHashTextSignature(args(0),
        intArg(args(1), "shingleLen"), intArg(args(2), "k"))))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NormalizeExpression.NfcNormalize].getName,
        "nfc_normalize"),
      (args: Seq[Expression]) =>
        graft.functions.NormalizeExpression.NfcNormalize(args(0))))

    ext.injectFunction((
      FunctionIdentifier("simhash_features"),
      new ExpressionInfo(classOf[SimHashFeatures].getName,
        "simhash_features"),
      (args: Seq[Expression]) => SimHashFeatures(args(0),
        intArg(args(1), "bits"))))

    ext.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(
        classOf[graft.functions.DeflateExpression.DeflateRatio].getName,
        "deflate_ratio"),
      (args: Seq[Expression]) =>
        graft.functions.DeflateExpression.DeflateRatio(args(0))))

    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(
        classOf[graft.functions.ZOrderExpression.InterleaveBits].getName,
        "interleave_bits"),
      (args: Seq[Expression]) =>
        graft.functions.ZOrderExpression.InterleaveBits(args(0), args(1))))
  }
}
