package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native expression for set-intersection cardinality over bitmap-encoded
  * feature sets (array<bigint> of 64-bit words).
  *
  * When a corpus' feature vocabulary is small (dense), per-document
  * bitmaps turn exact pairwise Jaccard from a postings self-join — join
  * volume Σ_f df_f², catastrophic on dense features — into popcount(A&B)
  * per candidate pair: a few dozen fused ALU ops inside whole-stage
  * codegen. See Dedup.jaccardPairsBitmap for the operator built on this.
  */
object BitmapExpressions {

  /** popcount(a & b) over two array<bigint> bitmaps. Extra words on the
    * longer side are treated as absent features (zero) — intersection only
    * covers the common prefix. Null if either side is null. */
  case class BitmapAndCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(t: DataType) =
        t == ArrayType(LongType, false) || t == ArrayType(LongType, true)
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_and_count needs array<bigint>, got " +
            s"${left.dataType} / ${right.dataType}")
    }

    override def nullable: Boolean =
      left.nullable || right.nullable

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: |A ∩ B| of two bitmap columns (array<bigint>). */
  def bitmap_and_count(a: Column, b: Column): Column =
    Bridge.toColumn(
      BitmapAndCount(Bridge.toExpression(a), Bridge.toExpression(b)))
}
