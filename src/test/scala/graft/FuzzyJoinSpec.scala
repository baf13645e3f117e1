package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // small alphabet + short strings: dense with genuine lev≤2 pairs,
  // including the del+ins (segment-shifting) shapes that break naive
  // chunk-equality blocking
  private val rnd = new scala.util.Random(7)
  private def rstr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString

  private lazy val corpus = {
    val bases = (0 until 80).map(i => (i.toLong, rstr(6 + rnd.nextInt(4))))
    val subst = bases.take(30).map { case (i, s0) =>
      val s = s0.toCharArray
      s(rnd.nextInt(s.length)) = ('a' + rnd.nextInt(4)).toChar
      (100L + i, new String(s))
    }
    val shifted = bases.slice(30, 50).map { case (i, s) =>
      (200L + i, s.substring(1) + ('a' + rnd.nextInt(4)).toChar)
    }
    (bases ++ subst ++ shifted).toDF("key", "txt")
      .withColumn("len", length($"txt"))
  }

  test("segment-index join is exactly the naive all-pairs result") {
    val fast = FuzzyJoin.selfJoin(corpus, col("key"), col("txt"), Seq(col("len")), k = 2)
      .as[(Long, Long, Long)].collect().toSet
    val naive = corpus.alias("l").join(corpus.alias("r"),
        col("l.len") === col("r.len") && col("l.key") < col("r.key"))
      .select(col("l.key"), col("r.key"),
        levenshtein(col("l.txt"), col("r.txt")).cast("long").as("d"))
      .filter($"d" <= 2).as[(Long, Long, Long)].collect().toSet
    assert(naive.nonEmpty, "fixture must contain true near-pairs")
    assert(fast === naive)
  }

  test("candidate generation is an equi-join, never a cross product") {
    val plan = FuzzyJoin.selfJoin(corpus, col("key"), col("txt"),
      Seq(col("len")), k = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("collapsed-distinct join is exactly the naive all-pairs result") {
    // plant exact duplicate texts across keys (the case the collapse
    // exploits: same-text groups must expand to C(n,2) dist-0 pairs)
    val dups = (0 until 15).map(i => (300L + i, corpus.collect()(i % 10)
      .getAs[String]("txt")))
    val withDups = corpus.select("key", "txt")
      .union(dups.toDF("key", "txt"))
      .withColumn("len", length($"txt"))
    val fast = FuzzyJoin.selfJoinCollapsed(withDups, col("key"), col("txt"),
        Seq(col("len")), k = 2)
      .as[(Long, Long, Long)].collect()
    val naive = withDups.alias("l").join(withDups.alias("r"),
        col("l.len") === col("r.len") && col("l.key") < col("r.key"))
      .select(col("l.key"), col("r.key"),
        levenshtein(col("l.txt"), col("r.txt")).cast("long").as("d"))
      .filter($"d" <= 2).as[(Long, Long, Long)].collect().toSet
    assert(naive.exists(_._3 == 0L), "fixture must contain exact-dup pairs")
    assert(fast.length == fast.toSet.size, "no duplicate output pairs")
    assert(fast.toSet === naive)
  }

  test("analytic pair count equals the materialized expansion count") {
    // same planted-duplicate fixture shape as the collapsed test —
    // repeated texts are exactly what the Σ n1·n2 / C(n,2) arithmetic
    // must get right
    val dups = (0 until 15).map(i => (300L + i, corpus.collect()(i % 10)
      .getAs[String]("txt")))
    val withDups = corpus.select("key", "txt")
      .union(dups.toDF("key", "txt"))
      .withColumn("len", length($"txt"))
    val expanded = FuzzyJoin.selfJoinCollapsed(withDups, col("key"), col("txt"),
      Seq(col("len")), k = 2)
    val counted = FuzzyJoin.selfJoinCollapsedCount(withDups, col("key"),
      col("txt"), Seq(col("len")), k = 2)
      .as[(Long, Long)].collect().head
    assert(counted._1 == expanded.count(),
      "analytic n_pairs diverged from the materialized expansion")
    assert(counted._2 > 0 && counted._2 <= counted._1 + withDups.count(),
      "n_text_pairs out of range")
  }
}
