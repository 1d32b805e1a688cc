package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, PolyHash}

/** Session-extension entry point: makes the library's codegen'd expressions
  * available to pure-SQL users at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  *
  * (Per-session registration without the config is
  * `graft.functions.VectorOps.registerSql(spark)`.) This is the
  * SparkSessionExtensions surface the catalog would grow custom
  * Rule/SparkStrategy injections on if an operator ever needs whole-plan
  * treatment; for the current surface, function injection is all that's
  * required (SURVEY.md §4: built-ins first, custom Catalyst with a
  * measured reason).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
  }
}
