package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document n-gram repetition covers, one native call per row.
  *
  * The composed form — per n, `array_sort(word_ngrams(toks, n))` folded
  * by an `aggregate` lambda with struct state — evaluates the fold
  * lambda per GRAM in interpreted mode (HOFs have no codegen): for the
  * Gopher repetition battery that is 9 sorted gram arrays and 9
  * interpreted folds per document, which made `gopher_repetition` the
  * heaviest single-plan text query at sf0.1. Here ONE static call
  * builds, sorts (binary UTF8 order — exactly `array_sort`'s
  * StringType ordering) and run-scans all requested n-gram lists,
  * returning every cover in a single long array.
  *
  * Semantics are bit-identical to the composed form (pinned in
  * TextAnalysisSpec against the old expression chain):
  *  - top cover (kind = true): occurrences × numChars of the most
  *    frequent gram, count ties broken to the lexicographically
  *    smallest (= first max run in sorted order, strict `>`);
  *  - dup cover (kind = false): Σ occurrences × numChars over grams
  *    occurring ≥ 2 times;
  *  - grams join tokens with a single space, null tokens skipped
  *    (`concat_ws` semantics, same as NgramUtil); arrays shorter than
  *    n yield 0.
  */
object GramCoverUtil {
  private val Space = UTF8String.fromString(" ")

  def covers(toks: ArrayData, ns: Array[Int],
             isTop: Array[Boolean]): ArrayData = {
    val out = new Array[Any](ns.length)
    val sz = toks.numElements()
    var s = 0
    while (s < ns.length) {
      val n = ns(s)
      val g = sz - n + 1
      if (g <= 0) {
        out(s) = 0L
      } else {
        val grams = new Array[UTF8String](g)
        val parts = new Array[UTF8String](n)
        var i = 0
        while (i < g) {
          var j = 0
          while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          grams(i) = UTF8String.concatWs(Space, parts: _*)
          i += 1
        }
        java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
        if (isTop(s)) {
          var best = 0L
          var bestLen = 0L
          var run = 0L
          i = 0
          while (i < g) {
            run = if (i > 0 && grams(i).equals(grams(i - 1))) run + 1L
                  else 1L
            if (run > best) { best = run; bestLen = grams(i).numChars() }
            i += 1
          }
          out(s) = best * bestLen
        } else {
          var acc = 0L
          var start = 0
          i = 1
          while (i <= g) {
            if (i == g || !grams(i).equals(grams(start))) {
              val cnt = i - start
              if (cnt >= 2) acc += cnt.toLong * grams(start).numChars()
              start = i
            }
            i += 1
          }
          out(s) = acc
        }
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

object GramCoverExpression {

  /** gram_covers(toks, specs): array<long> of one cover per spec, in
    * spec order; spec = (n, isTop). */
  case class GramCovers(child: Expression, ns: Seq[Int],
                        isTop: Seq[Boolean]) extends UnaryExpression {
    require(ns.nonEmpty && ns.length == isTop.length &&
      ns.forall(_ >= 1), "gram_covers needs aligned specs with n >= 1")

    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckFailure(s"gram_covers needs array<string>, got $other")
      }
    }

    @transient private lazy val nsArr = ns.toArray
    @transient private lazy val topArr = isTop.toArray

    override def nullSafeEval(toks: Any): Any =
      GramCoverUtil.covers(toks.asInstanceOf[ArrayData], nsArr, topArr)

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val nsRef = ctx.addReferenceObj("gramCoverNs", nsArr, "int[]")
      val topRef = ctx.addReferenceObj("gramCoverTop", topArr, "boolean[]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GramCoverUtil.covers($c, $nsRef, $topRef)")
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API. */
  def gram_covers(tokens: Column, specs: Seq[(Int, Boolean)]): Column =
    Bridge.toColumn(GramCovers(Bridge.toExpression(tokens),
      specs.map(_._1), specs.map(_._2)))
}
