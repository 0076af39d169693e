package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleaving — the layout primitive behind
  * multi-dimensional clustering: sorting/range-partitioning by the
  * interleaved code keeps EVERY participating column range-bounded per
  * file, so min/max pruning works for predicates on any single dimension
  * (a plain sort bounds only its leading column). At 100 TB this is the
  * difference between "queries on the second key scan everything" and
  * "they prune like queries on the first".
  *
  * Callers should quantile-normalize dimensions of unequal ranges first
  * (e.g. `ntile`): interleaving raw values lets the wider dimension's
  * high bits dominate and degenerates to a plain sort on it.
  */
object ZOrderExpression {

  /** Pure reference codec (also the interpreted eval path). */
  object ZOrderCodec {
    /** Spread the low 32 bits of x across the even bit positions. */
    def spread(v: Long): Long = {
      var x = v & 0xFFFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }

    /** 64-bit Morton code: x on even bits, y on odd bits. */
    def interleave(x: Long, y: Long): Long =
      spread(x) | (spread(y) << 1)
  }

  /** Codegen'd 2-D Morton code of the low 32 bits of two integral
    * columns. One fused bit-twiddle per row — stays inside
    * whole-stage codegen, no UDF boundary. */
  case class InterleaveBits(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType | IntegerType, LongType | IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"interleave_bits needs two integral columns, got ($l, $r)")
      }

    private def asLong(v: Any): Long = v match {
      case i: Int => i.toLong
      case l: Long => l
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      ZOrderCodec.interleave(asLong(l), asLong(r))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        def spreadCode(v: String): String =
          s"""$v = $v & 4294967295L;
             |$v = ($v | ($v << 16)) & 281470681808895L;
             |$v = ($v | ($v << 8)) & 71777214294589695L;
             |$v = ($v | ($v << 4)) & 1085102592571150095L;
             |$v = ($v | ($v << 2)) & 3689348814741910323L;
             |$v = ($v | ($v << 1)) & 6148914691236517205L;""".stripMargin
        s"""long $x = (long) $l;
           |long $y = (long) $r;
           |${spreadCode(x)}
           |${spreadCode(y)}
           |${ev.value} = $x | ($y << 1);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): InterleaveBits =
      copy(left = newLeft, right = newRight)
  }

  /** Column API. */
  def interleave_bits(x: Column, y: Column): Column =
    Bridge.toColumn(
      InterleaveBits(Bridge.toExpression(x), Bridge.toExpression(y)))
}
