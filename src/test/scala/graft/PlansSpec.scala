package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Catalyst extension points: the ReplaceTokenCount optimizer rule. */
class PlansSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("size(split(text, ' ')) is rewritten to graft_token_count and agrees") {
    // plan assertion needs a real scan — over LocalRelation the
    // optimizer's ConvertToLocalRelation evaluates the (rewritten)
    // projection eagerly and leaves no expression to inspect
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(size(split(col("text"), " ")).as("n"))
    assert(docs.queryExecution.optimizedPlan.toString.contains("graft_token_count"),
      s"rule did not fire:\n${docs.queryExecution.optimizedPlan}")
    // value parity on edge strings (empty, multi/trailing separators);
    // runs through TokenCountExpr's eval path via ConvertToLocalRelation
    val df = Seq("a b c", "", " ", "a  b", "trailing ", "one").toDF("text")
    val counted = df.select(size(split(col("text"), " ")).as("n"))
    assert(counted.collect().map(_.getInt(0)).toSeq ==
      Seq(3, 1, 2, 3, 2, 1))
  }

  test("rule preserves null semantics and skips non-space patterns") {
    val df = Seq(Some("a b"), None).toDF("text")
    val got = df.select(size(split(col("text"), " ")).as("n")).collect()
    assert(got(0).getInt(0) == 2 && got(1).isNullAt(0))
    val comma = df.select(size(split(col("text"), ",")).as("n"))
    assert(!comma.queryExecution.optimizedPlan.toString.contains("graft_token_count"))
  }

  test("graft_token_count is registered for SQL") {
    assert(spark.sql("SELECT graft_token_count('x y z')").head().getInt(0) == 3)
  }
}
