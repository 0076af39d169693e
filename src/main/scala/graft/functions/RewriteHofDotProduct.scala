package graft.functions

import graft.functions.VectorExpressions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * and substitute the codegen'd native [[DotProduct]] — which evaluates
  * the same left-to-right double fold (and the same null semantics:
  * unequal lengths or null elements → null), so the rewrite is
  * bit-exact. HOFs are interpreted per element; on a 2M-pair similarity
  * join this rewrite alone is worth ~40×. Registered by
  * [[graft.GraftExtensions]] via injectOptimizerRule, so even SQL users
  * writing the idiomatic HOF form get the fast path.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isPair(l: Expression, r: Expression,
                     v1: NamedLambdaVariable, v2: NamedLambdaVariable)
      : Boolean =
    (isVar(l, v1) && isVar(r, v2)) || (isVar(l, v2) && isVar(r, v1))

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => isVar(body, v)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(al, ar, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            finish)
          if zero == 0.0 && isPair(mx, my, x, y) && isPair(al, ar, acc, el) &&
             isIdentity(finish) && isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
