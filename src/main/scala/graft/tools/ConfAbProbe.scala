package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Interleaved A/B of RUNTIME session confs over named catalog entries
  * — the measured answer to "would guide-§9 settings help at scale"
  * (preferSortMergeJoin=false, AQE shuffled-hash threshold, …).
  * Counterbalanced A/B inside one JVM like tools.CacheAbProbe: modes
  * alternate per entry per round with the order flipped on every
  * round, so box drift and back-to-back-run bias cancel.
  *
  * Usage: runMain graft.tools.ConfAbProbe <sfDir> <rounds> \
  *          <k1=v1,k2=v2[;k3=v3,…]> <name,name,…>
  * Mode A = session defaults, mode B = the conf list applied (restored
  * after each B run).
  */
object ConfAbProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ConfAbProbe <sfDir> <rounds> <confs> <names>")
    val sfDir = args(0)
    val rounds = args(1).toInt
    val confs = args(2).split(',').map { kv =>
      val Array(k, v) = kv.split('=')
      (k, v)
    }.toSeq
    val names = args(3).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuneFor(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      sfDir, cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    val sel = names.flatMap(n => all.get(n).map(n -> _))
    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    def setMode(b: Boolean): Unit =
      if (b) confs.foreach { case (k, v) => spark.conf.set(k, v) }
      else saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    sel.foreach { case (_, fn) => try run(fn) catch { case _: Throwable => () } }
    val base = collection.mutable.Map.empty[String, Double]
    val alt = collection.mutable.Map.empty[String, Double]
    for (r <- 1 to rounds; case (name, fn) <- sel;
         mode <- if (r % 2 == 1) Seq(false, true) else Seq(true, false)) {
      setMode(mode)
      spark.sparkContext.setJobDescription(s"$name alt=$mode")
      try {
        val w = run(fn)
        val m = if (mode) alt else base
        m(name) = math.min(w, m.getOrElse(name, Double.MaxValue))
      } catch { case e: Throwable =>
        System.err.println(s"[conf] $name alt=$mode failed: ${e.getMessage}")
      }
    }
    setMode(false)
    var (sb, sa) = (0.0, 0.0)
    sel.map(_._1).foreach { n =>
      (base.get(n), alt.get(n)) match {
        case (Some(b), Some(a)) =>
          sb += b; sa += a
          println(f"[conf] $n%-34s base=$b%7.3f alt=$a%7.3f ratio=${a / b}%5.3f")
        case _ => println(s"[conf] $n missing a mode")
      }
    }
    println(f"[conf] TOTAL base=$sb%8.2f alt=$sa%8.2f ratio=${sa / sb}%5.3f")
    spark.stop()
  }
}
