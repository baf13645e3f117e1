package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Par

/** [[graft.ops.Par.spread]]: width decisions come from the logical
  * plan's file relations (no eager physical planning via df.rdd).
  */
class ParSpec extends AnyFunSuite with SparkTestBase {

  test("spread widens a narrow file scan to the session parallelism") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val s = Par.spread(df)
    assert(s ne df, "bench-sized scan should be repartitioned")
    assert(s.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
  }

  test("spread is a no-op when the scan is already wide") {
    // shrink the split size so the same file estimates wider than the
    // session parallelism — the real-scale shape where an extra
    // round-robin shuffle would be pure cost
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try {
      val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      assert(Par.spread(df) eq df)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("spread does not inject a shuffle into non-file plans") {
    import spark.implicits._
    // driver-local relations are width-1 by construction → spread
    val local = Seq((1L, "a")).toDF("id", "v")
    assert(Par.spread(local) ne local)
  }

  test("spread reads a checkpointed plan's ACTUAL partition count") {
    import spark.implicits._
    // a LogicalRDD leaf carries its RDD's real width: a narrow
    // checkpoint must spread (the old assume-wide rule pinned an
    // 8M-pair scan to one task when a one-split fixture was
    // localCheckpoint'd), a wide one must stay untouched
    val wideEnough = spark.sessionState.conf.numShufflePartitions
    val narrow = (1L to 100L).toDF("id").repartition(1).localCheckpoint()
    assert(Par.spread(narrow) ne narrow,
      "1-partition checkpoint must be re-spread")
    val wide = (1L to 100L).toDF("id").repartition(wideEnough)
      .localCheckpoint()
    assert(Par.spread(wide) eq wide,
      "already-wide checkpoint must not pay an extra exchange")
  }
}
