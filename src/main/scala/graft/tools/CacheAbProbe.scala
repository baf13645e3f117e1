package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry, Tables}
import graft.ops.Similarity

/** Interleaved A/B for the r14 session caches (index-model epoch cache
  * + fixture schema memo): runs each named catalog entry cache-ON and
  * cache-OFF alternately inside ONE JVM, several rounds, and reports
  * the per-mode min. Interleaving is the only noise-immune protocol on
  * this box — identical-code bench reruns measured a p10–p90 per-entry
  * spread of 0.66–1.37× (OPTIMIZATION_r14.md baseline section), so
  * sequential A-then-B runs cannot attribute a 10–30 % effect.
  *
  * Fixture index builds and margin calibrations happen on first touch
  * and are shared by both modes, so the A/B isolates exactly the cache.
  *
  * Usage: runMain graft.tools.CacheAbProbe <sfDir> [rounds] [names...]
  */
object CacheAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.filter(n =>
        n.contains("sim_") || n.contains("dedup_embedding")).toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuneFor(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      sfDir, cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    val sel = names.flatMap(n => all.get(n).map(n -> _))
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both modes once (JIT + fixture builds land here)
    sel.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    val on = collection.mutable.Map.empty[String, Double]
    val off = collection.mutable.Map.empty[String, Double]
    // alternate the mode ORDER per round: a fixed on-then-off order
    // measured pure-bruteforce entries (no cache in the path) at
    // ratio 2.07 — back-to-back same-query runs favor the second —
    // so the order itself must be counterbalanced
    for (r <- 1 to rounds; case (name, fn) <- sel;
         mode <- if (r % 2 == 1) Seq(true, false) else Seq(false, true)) {
      Similarity.modelCacheEnabled = mode
      Tables.schemaCacheEnabled = mode
      spark.sparkContext.setJobDescription(s"$name cache=$mode")
      try {
        val w = run(fn)
        val m = if (mode) on else off
        m(name) = math.min(w, m.getOrElse(name, Double.MaxValue))
      } catch { case e: Throwable =>
        System.err.println(s"[ab] $name cache=$mode failed: ${e.getMessage}")
      }
    }
    Similarity.modelCacheEnabled = true
    Tables.schemaCacheEnabled = true
    var (sumOn, sumOff) = (0.0, 0.0)
    sel.map(_._1).foreach { n =>
      (on.get(n), off.get(n)) match {
        case (Some(a), Some(b)) =>
          sumOn += a; sumOff += b
          println(f"[ab] $n%-38s on=$a%6.3f off=$b%6.3f ratio=${a / b}%5.3f")
        case _ => println(s"[ab] $n missing a mode")
      }
    }
    println(f"[ab] TOTAL on=$sumOn%7.2f off=$sumOff%7.2f ratio=${sumOn / sumOff}%5.3f")
    spark.stop()
  }
}
