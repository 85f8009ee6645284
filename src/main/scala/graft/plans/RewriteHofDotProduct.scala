package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotFold

/** Catalyst optimizer rule: rewrite the idiomatic higher-order-function
  * dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the engine's codegen'd [[graft.functions.DotFold]].
  *
  * Why a RULE and not just the function: `dot_fold` already exists for
  * callers who know about it, but the HOF spelling is what a SQL user or
  * a ported pipeline naturally writes — and Spark evaluates HOF lambdas
  * interpreted, one boxed step per element, breaking whole-stage codegen
  * around the hottest arithmetic in the similarity family. The rewrite
  * gives every query the fast path without anyone opting in. This is the
  * custom-operator preference ladder's rule tier (SURVEY.md §2: compose
  * > Expression > plan rule), used here for a pure cost rewrite with
  * unchanged semantics.
  *
  * Semantics preservation (the reason the match is this narrow):
  * [[DotFold]]'s eval is DEFINED as the exact fold this expression
  * computes — strict left-to-right double summation, NULL iff lengths
  * differ or any element is NULL — so the rewrite is observationally
  * identical, not merely approximately equal (PlanSpec pins both the
  * firing and the equality). Anything that doesn't match EXACTLY — a
  * non-zero seed, a non-identity finish lambda, `acc + 2*v`, non-double
  * arrays — is left untouched. Multiplication and addition of doubles
  * are commutative (not associative — but the fold order itself is
  * preserved), so both operand orders inside each lambda are accepted.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.Sessions]]), so it runs in the operator-optimization batch of
  * every engine session.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  /** finish lambda is the identity: `state -> state`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  /** zip lambda multiplies exactly its two arguments (either order). */
  private def isPairwiseMul(f: Expression): Boolean = f match {
    case LambdaFunction(
          Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  /** merge lambda adds exactly its two arguments (either order). */
  private def isPairwiseAdd(f: Expression): Boolean = f match {
    case LambdaFunction(
          Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Seed must be POSITIVE zero bitwise: Scala pattern-matching 0.0 would
    // also accept -0.0 (primitive ==), but a -0.0D seed is observable —
    // the empty-array fold returns the seed itself, and DotFold's
    // accumulator starts at +0.0 — so it must stay un-rewritten.
    case ArrayAggregate(ZipWith(a, b, mul), Literal(seed: java.lang.Double, DoubleType),
          merge, finish)
        if java.lang.Double.doubleToRawLongBits(seed) == 0L &&
          isDoubleArray(a) && isDoubleArray(b) &&
          isPairwiseMul(mul) && isPairwiseAdd(merge) && isIdentity(finish) =>
      DotFold(a, b)
  }
}
