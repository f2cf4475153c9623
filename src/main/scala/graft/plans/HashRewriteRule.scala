package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Optimizer rule: rewrite the composable stable-hash idiom
  *
  *   CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  *
  * into the native [[StableHash60]] expression. Users (and the oracle
  * parity docs) write the portable form; the optimizer gives them the
  * bytes→long fast path — no hex materialization, no base-16 decimal
  * parse — without changing a single result bit.
  *
  * Registered via [[GraftExtensions]] (injectOptimizerRule).
  */
object HashRewriteRule extends Rule[LogicalPlan] {

  /** md5(string) analyzes as Md5(Cast(x, BINARY)) — unwrap back to the
    * string child StableHash60 expects. */
  private object StringToMd5Bytes {
    def unapply(e: Expression): Option[Expression] = e match {
      case Md5(Cast(inner, BinaryType, _, _)) if inner.dataType == StringType =>
        Some(inner)
      case Md5(inner) if inner.dataType == StringType => Some(inner)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Cast(
            Conv(
              Substring(StringToMd5Bytes(inner), Literal(1, _), Literal(15, _)),
              Literal(16, _),
              Literal(10, _),
              _),
            LongType, _, _) =>
        StableHash60(inner)
    }
}
