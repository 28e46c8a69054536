package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-cutting column combinators. */
object ColumnOps {

  /** Evaluate `v` once per row and reference it many times in `body`.
    * Catalyst performs no common-subexpression elimination inside
    * higher-order-function lambdas, so a composite expression used n
    * times inside a `transform`/`aggregate` is re-evaluated n times —
    * which compounds catastrophically when the expression is itself a
    * fold. Binding through a single-element transform turns it into a
    * lambda variable: computed once, O(1) per reference.
    */
  def let(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), x => body(x)), 1)
}
