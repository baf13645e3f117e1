package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every catalog query end-to-end on
  * SPARK_GRAFT_SF_DIR and prints one JSON line (BENCH_r{N}.json).
  *
  * Queries run through the `noop` sink so the FULL plan executes
  * (a bare `count()` would let Catalyst prune most of the work).
  * A warm-up pass at sf0.001 (when present) absorbs JIT/codegen
  * compilation so the timed numbers reflect steady-state throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional args: only bench queries whose name contains any of the
    // comma-separated substrings (driver passes none → full catalog)
    val nameFilters = args.lift(0).getOrElse("").split(',').toSeq
    def selected = SparkEntry.queries.filter(q => nameFilters.exists(q._1.contains))
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def execute(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String): Unit =
      fn(spark, dir).write.mode("overwrite").format("noop").save()

    // JIT/codegen warm-up on the smallest fixture
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { case (_, fn) =>
        try execute(fn, warmDir) catch { case _: Throwable => () }
      }

    // best-of-2 per query: single runs show occasional 5-10× GC/IO
    // outliers on this box; the min reflects steady-state throughput
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try execute(fn, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
