package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-array n-gram builder, invoked once per row from generated code.
  *
  * The composed form — `transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, n)))` — is a higher-order function: Spark evaluates the
  * lambda per *element* in interpreted mode (HOFs have no codegen), which
  * put n-gram generation at the top of the sf0.1 bench profile for every
  * query that shingles text (top_bigrams, Jaccard postings, SimHash
  * features). Here the whole array is processed by one static Java call
  * on UTF8String, with no per-element expression dispatch.
  */
object NgramUtil {
  private val Space = UTF8String.fromString(" ")

  def ngrams(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i < sz - n + 1) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // concat_ws semantics: null elements are skipped
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object NgramExpression {

  /** Word n-grams over array<string>: ngrams(["a","b","c"], 2) =
    * ["a b","b c"]; arrays shorter than n yield []. Same results as the
    * composed transform/slice/concat_ws form (asserted in spec). */
  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "n must be >= 1")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"word_ngrams needs array<string>, got $other")
      }
    }

    override def nullSafeEval(toks: Any): Any =
      NgramUtil.ngrams(toks.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NgramUtil.ngrams($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API. */
  def word_ngrams(tokens: Column, n: Int): Column =
    Bridge.toColumn(WordNgrams(Bridge.toExpression(tokens), n))
}
