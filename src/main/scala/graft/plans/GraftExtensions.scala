package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.ArrayDotProduct

/** Catalyst integration point: registers graft's native expressions with a
  * SparkSession at build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * }}}
  *
  * or via config (cluster deployments, no code change):
  * `spark.sql.extensions=graft.plans.GraftExtensions`. After registration
  * `graft_dot(a, b)` is available from SQL text as well as the Column API.
  *
  * (Runtime registration for sessions created elsewhere — e.g. the
  * driver-owned session in `SparkEntry` — goes through
  * [[graft.functions.ArrayOps.register]], which targets the session's
  * function registry directly. Both paths bind the same expression.)
  *
  * No custom `Rule`/`SparkStrategy` is injected: SURVEY.md §4.2 —
  * every reference operator maps to stock Catalyst plans; the only
  * genuinely missing piece was a codegen'd vector dot product.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getCanonicalName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDotProduct(exprs.head, exprs(1))))
  }
}
