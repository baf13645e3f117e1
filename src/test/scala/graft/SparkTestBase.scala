package graft

import org.apache.spark.sql.SparkSession

/** One shared tuned session across all suites (sbt runs them in one
  * forked JVM; `getOrCreate` dedupes).
  */
trait SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local(4)
}
