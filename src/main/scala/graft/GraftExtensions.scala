package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProductExpr, SimHashExpr, TokenCountExpr}
import graft.plans.ReplaceTokenCount

/** SparkSessionExtensions hook exposing graft's custom expressions to
  * SQL users (`spark.sql("SELECT graft_dot(a, b) ...")`). Activated by
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession.tune
  * sets it) or `withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_dot(a, b) takes two array args")
        DotProductExpr(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "graft_simhash(text) takes one string arg")
        SimHashExpr(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCountExpr].getName, "graft_token_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "graft_token_count(text) takes one string arg")
        TokenCountExpr(exprs.head)
      }))
    e.injectOptimizerRule(_ => ReplaceTokenCount)
  }
}
