package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** `PredicateUtils.toV1` (DSv2 `Predicate` → V1 source `Filter`) is
  * private[sql]; the native batch scan's runtime-filtering hook
  * receives V2 predicates and routes them through the engine's ONE
  * filter-translation path (`FilterTranslation.toColumn`), which speaks
  * V1 filters. Same shim pattern as [[PlanBridge]] — one conversion
  * re-exported, no internals copied or altered.
  */
object PredicateBridge {
  def toV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}
