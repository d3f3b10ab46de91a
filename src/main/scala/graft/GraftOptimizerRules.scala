package graft

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.GraftExpressions.IntersectCountS

/** Catalyst optimizer rule: `size(array_intersect(a, b))` over string
  * arrays — the exact-Jaccard verify pattern — never needs the
  * intersection ARRAY, only its cardinality. Rewrite to the one-pass
  * [[IntersectCountS]] kernel (hash the smaller side, probe the larger,
  * no output array allocation).
  *
  * Scope guards, each load-bearing for semantics-preservation:
  *  - string element type only (the kernel's specialization);
  *  - `legacySizeOfNull = false` only — legacy `size` returns -1 on null
  *    input, the kernel (like any null-intolerant expression) returns
  *    null. With the guard, both formulations return null there.
  *
  * Count-distinct parity: `array_intersect` returns DISTINCT elements of
  * `a` present in `b`, so its size is |distinct(a) ∩ distinct(b)| — a
  * symmetric quantity, which is what the kernel counts (probe-side
  * de-dup by removing on hit).
  *
  * Injected by [[GraftExtensions]]; sessions without the extension still
  * get the kernel explicitly via `GraftExpressions.intersectCount`.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  private def stringArray(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ai: ArrayIntersect, false)
          if s.resolved && stringArray(ai.left) && stringArray(ai.right) =>
        IntersectCountS(ai.left, ai.right)
    }
}
