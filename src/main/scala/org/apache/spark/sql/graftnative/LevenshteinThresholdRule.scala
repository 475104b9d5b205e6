package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded levenshtein comparisons against a
  * constant budget into Spark's threshold-bounded form —
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *
  * The threshold form returns -1 as soon as the running distance
  * exceeds k, running the banded O(k·n) algorithm instead of the full
  * O(n·m) matrix — the decisive cost in fuzzy-search scans where
  * almost every pair misses. The library's own search path builds the
  * bounded form directly ([[graft.search.Search]]); this rule gives
  * ad-hoc SQL (`WHERE levenshtein(a, b) <= 2`) the same plan.
  *
  * Idempotent by construction: the rewritten comparison carries a
  * threshold, which no pattern here matches.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(kv: Int, IntegerType))
          if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
      case GreaterThanOrEqual(k @ Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
          if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
      case LessThan(Levenshtein(a, b, None), Literal(kv: Int, IntegerType))
          if kv >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
      case GreaterThan(Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
          if kv >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
    }
}
