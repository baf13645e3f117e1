package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProductExpr, JaccardSortedExpr, JsonStringMapExpr, LevWithinExpr, ShingleCodesExpr, SimHashExpr, TokenCountExpr}
import graft.plans.{ReplaceLevenshtein, ReplaceTokenCount}

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
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleCodesExpr].getName, "graft_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_shingles(text, n) takes text and a literal n")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles: n must be an integer literal, got $other")
        }
        ShingleCodesExpr(exprs.head, n, distinct = true)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSortedExpr].getName, "graft_jaccard"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_jaccard(a, b) takes two sorted array<long> args")
        JaccardSortedExpr(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_json_map"),
      new ExpressionInfo(classOf[JsonStringMapExpr].getName, "graft_json_map"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "graft_json_map(text) takes one string arg")
        JsonStringMapExpr(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_lev_within"),
      new ExpressionInfo(classOf[LevWithinExpr].getName, "graft_lev_within"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 3, "graft_lev_within(l, r, k) takes two strings and a literal k")
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_lev_within: k must be an integer literal, got $other")
        }
        LevWithinExpr(exprs(0), exprs(1), k)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bpe_segment"),
      new ExpressionInfo(classOf[graft.functions.BpeSegmentExpr].getName, "graft_bpe_segment"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // merge table as a literal: pairs "a b" separated by commas,
        // in learned order — e.g. graft_bpe_segment(text, 'e s,es t')
        require(exprs.length == 2,
          "graft_bpe_segment(text, merges) takes text and a literal merge table")
        val spec = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_bpe_segment: merges must be a string literal 'a b,ab c', got $other")
        }
        val merges = spec.split(',').toSeq.filter(_.nonEmpty).map { p =>
          p.split(' ') match {
            // empty symbols (a space-after-comma typo like 'e s, st')
            // must fail loudly — an empty symbol never matches, so the
            // merge would be silently inert
            case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
            case _ => throw new IllegalArgumentException(
              s"graft_bpe_segment: each merge must be 'left right', got '$p'")
          }
        }
        graft.functions.BpeSegmentExpr(merges, exprs.head)
      }))
    // optional trailing k: graft_kll_agg(v) or graft_kll_agg(v, 400)
    def kllK(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
             fn: String): Int = exprs match {
      case Seq(_) => 200
      case Seq(_, org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
      case _ => throw new IllegalArgumentException(
        s"$fn takes (input) or (input, k) with k an integer literal")
    }
    e.injectFunction((
      FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[graft.functions.QuantileSketch.KllAgg].getName, "graft_kll_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.QuantileSketch.KllAgg(exprs.head, kllK(exprs, "graft_kll_agg"))))
    e.injectFunction((
      FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[graft.functions.QuantileSketch.KllMergeAgg].getName, "graft_kll_merge"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.QuantileSketch.KllMergeAgg(exprs.head, kllK(exprs, "graft_kll_merge"))))
    e.injectFunction((
      FunctionIdentifier("graft_kll_quantile"),
      new ExpressionInfo(classOf[graft.functions.QuantileSketch.KllQuantileExpr].getName, "graft_kll_quantile"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_kll_quantile(sketch, rank) takes a binary and a literal rank")
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType}
        // SQL `0.5` parses as a Decimal literal; accept numerics ONLY
        // (a date/bool literal stringifying to a number must not
        // silently become a rank)
        val rank = exprs(1) match {
          case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
          case Literal(v: Double, DoubleType) => v
          case Literal(v: Float, FloatType) => v.toDouble
          case Literal(v: Int, IntegerType) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_kll_quantile: rank must be a numeric literal, got $other")
        }
        graft.functions.QuantileSketch.KllQuantileExpr(exprs.head, rank)
      }))
    e.injectOptimizerRule(_ => ReplaceTokenCount)
    e.injectOptimizerRule(_ => ReplaceLevenshtein)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
