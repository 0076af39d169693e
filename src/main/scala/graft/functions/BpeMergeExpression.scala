package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge step: replace every non-overlapping adjacent
  * occurrence of (a, b) in a symbol sequence with the merged symbol
  * a+b, scanning left to right greedily — ["a","a","a"] under merge
  * (a,a) becomes ["aa","a"], the textbook semantics.
  *
  * Runs once per vocabulary row per training iteration. A fold via the
  * `aggregate` HOF could emulate it (struct-state accumulator), but
  * that is interpreted per element AND per iteration; this is one
  * static call, codegen-friendly, and the merged pair is a plain
  * per-expression constant (the trainer bakes each iteration's winning
  * pair in before execution).
  */
object BpeMergeUtil {
  def merge(syms: ArrayData, a: UTF8String, b: UTF8String,
            ab: UTF8String): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return syms
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && a.equals(syms.getUTF8String(i)) &&
          b.equals(syms.getUTF8String(i + 1))) {
        out.add(ab)
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object BpeMergeExpression {

  /** Merge adjacent (a, b) → a+b in an array<string> column. */
  case class BpeMergePair(child: Expression, a: String, b: String)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"bpe_merge_pair needs array<string>, got $other")
      }
    }

    private lazy val ua = UTF8String.fromString(a)
    private lazy val ub = UTF8String.fromString(b)
    private lazy val uab = UTF8String.fromString(a + b)

    override def nullSafeEval(syms: Any): Any =
      BpeMergeUtil.merge(syms.asInstanceOf[ArrayData], ua, ub, uab)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val refA = ctx.addReferenceObj("bpeA", ua, classOf[UTF8String].getName)
      val refB = ctx.addReferenceObj("bpeB", ub, classOf[UTF8String].getName)
      val refAb = ctx.addReferenceObj("bpeAb", uab, classOf[UTF8String].getName)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.BpeMergeUtil.merge($c, $refA, $refB, $refAb)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API. */
  def bpe_merge_pair(symbols: Column, a: String, b: String): Column =
    Bridge.toColumn(BpeMergePair(Bridge.toExpression(symbols), a, b))
}
