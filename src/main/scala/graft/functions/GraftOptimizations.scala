package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Reverse}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Peephole optimizer rule injected through
  * `SparkSessionExtensions.injectOptimizerRule` — the engine's
  * demonstration of the Catalyst rule surface (SURVEY §4 notes no rule
  * is REQUIRED for parity; these are cheap wins for our own idioms).
  *
  *  - `reverse(reverse(x))` -> `x`: the directed-graph expansion
  *    composes `reverse` freely (osm-road-graphs.sql:205,217 callers);
  *    double application cancels (tested as a property in
  *    FunctionsSpec).
  *  - `array_distinct(array_distinct(x))` -> `array_distinct(x)`:
  *    idempotent; dedup fingerprint pipelines chain it through helper
  *    boundaries.
  *  - `nfc_normalize(nfc_normalize(x))` -> `nfc_normalize(x)`: NFC is
  *    idempotent (UAX#15); curation pipelines normalize defensively at
  *    helper boundaries, and each dropped application saves a per-row
  *    `isNormalized` scan.
  */
object GraftOptimizations extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Reverse(Reverse(child)) => child
      case ArrayDistinct(inner @ ArrayDistinct(_)) => inner
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
