package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fused random-hyperplane LSH signature as a native codegen expression.
  *
  * Bit p of the result is the sign of `plane_p · v`, where plane
  * component (p, j) is a deterministic ±1 drawn from bit 0 of
  * xxh64(j, seed=p) — the same hash family the interpreted formulation
  * used, now evaluated in one primitive pass: a single loop over the
  * vector feeds nBits accumulators, so the whole signature costs
  * O(dim × nBits) multiply-adds with zero allocation (vs. nBits separate
  * interpreted zip_with/transform/aggregate passes, each boxing every
  * element — the round-1 bench showed that form losing to brute force).
  *
  * Returned packed in one long (nBits ≤ 62), so banding downstream is
  * shift-and-mask on a primitive column — no array handling at all.
  */
case class LshSignBits(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits > 0 && nBits <= 62, s"nBits must be in [1, 62], got $nBits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_sign_bits needs array<double>, got $other")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val acc = new Array[Double](nBits)
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return null
      val x = v.getDouble(j)
      var p = 0
      while (p < nBits) {
        if ((XXH64.hashLong(j, p) & 1L) == 1L) acc(p) += x else acc(p) -= x
        p += 1
      }
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < nBits) {
      if (acc(p) > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = classOf[XXH64].getName
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |double[] $acc = new double[$nBits];
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = $v.getDouble($i);
         |  for (int $p = 0; $p < $nBits; $p++) {
         |    if (($xxh.hashLong((long) $i, (long) $p) & 1L) == 1L) {
         |      $acc[$p] += $x;
         |    } else {
         |      $acc[$p] -= $x;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < $nBits; $p++) {
         |  if ($acc[$p] > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshExpression {
  /** Column API: nBits-wide sign-bit LSH signature packed in a long. */
  def lsh_sign_bits(vec: Column, nBits: Int): Column =
    Bridge.toColumn(LshSignBits(Bridge.toExpression(vec), nBits))
}
