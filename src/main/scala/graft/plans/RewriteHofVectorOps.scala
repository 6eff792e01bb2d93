package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function dot / norm patterns
  * (`VectorFuns.dot` / `VectorFuns.l2norm`, or the equivalent SQL a user
  * writes by hand) into the native [[FloatDot]] / [[FloatNorm]]
  * expressions.
  *
  * The HOF form is the natural way to WRITE vector math
  * (`aggregate(zip_with(a, b, (x, y) -> …))`), but it evaluates an
  * interpreted lambda per element with an intermediate array. The native
  * expressions are bit-identical (same sequential double fold — asserted
  * in `FloatVectorExprSpec`), so the rewrite is a pure win and users get
  * the codegen fast path without knowing the native functions exist —
  * the same contract Catalyst applies everywhere: declare the semantics,
  * the optimizer picks the implementation.
  *
  * Matching is deliberately EXACT (float arrays, double 0.0 seed,
  * cast-multiply-accumulate in canonical order, identity finish) — any
  * deviation falls through untouched.
  */
object RewriteHofVectorOps extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def doubleCastOf(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == DoubleType => Some(c.child)
    case _ => None
  }

  private def isZeroSeed(e: Expression): Boolean = e match {
    case Literal(v, DoubleType) => v == 0.0
    case _ => false
  }

  /** acc + v accumulation over the zipped products → (a, b). */
  private object DotPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul: Multiply,
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            seed,
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fx: NamedLambdaVariable), _))
          if isFloatArray(a) && isFloatArray(b) && isZeroSeed(seed) &&
            doubleCastOf(mul.left).exists(_.semanticEquals(zx)) &&
            doubleCastOf(mul.right).exists(_.semanticEquals(zy)) &&
            add.left.semanticEquals(acc) && add.right.semanticEquals(v) &&
            fin.semanticEquals(fx) =>
        Some((a, b))
      case _ => None
    }
  }

  /** sqrt(acc + cast(v)*cast(v) fold) → a. */
  private object NormPattern {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(a, seed,
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fx: NamedLambdaVariable), _)))
          if isFloatArray(a) && isZeroSeed(seed) &&
            add.left.semanticEquals(acc) &&
            (add.right match {
              case m: Multiply =>
                doubleCastOf(m.left).exists(_.semanticEquals(v)) &&
                  doubleCastOf(m.right).exists(_.semanticEquals(v))
              case _ => false
            }) &&
            fin.semanticEquals(fx) =>
        Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormPattern(a) => FloatNorm(a)
      case DotPattern(a, b) => FloatDot(a, b)
    }
}
