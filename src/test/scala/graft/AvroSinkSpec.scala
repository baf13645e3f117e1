package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._
import graft.ingest.KlineIngest
import graft.sinks.AvroSink

class AvroSinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("avro sink: executor-parallel container files, readable by plain Avro") {
    val dir = Files.createTempDirectory("avro-out").toString
    val df = Seq(
      ("BTC", 1L, 10.5, 3), ("ETH", 2L, 20.25, 4), ("XRP", 3L, 0.5, 5)
    ).toDF("coin", "ts", "price", "n").repartition(2)
    AvroSink.write(df, dir)

    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty && files.length <= 2)
    val rows = files.flatMap { f =>
      val r = DataFileReader.openReader(f, new GenericDatumReader[GenericRecord]())
      try {
        val b = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Int)]
        while (r.hasNext) {
          val rec = r.next()
          b += ((rec.get("coin").toString, rec.get("ts").asInstanceOf[Long],
            rec.get("price").asInstanceOf[Double], rec.get("n").asInstanceOf[Int]))
        }
        b
      } finally r.close()
    }
    assert(rows.toSet == Set(("BTC", 1L, 10.5, 3), ("ETH", 2L, 20.25, 4), ("XRP", 3L, 0.5, 5)))
  }

  test("kafka produce frame round-trips through parse") {
    val df = Seq(("BTC", 1704067200000L)).toDF("coin", "timestamp")
      .withColumn("interval", lit("1m"))
    val frame = KlineIngest.toKafkaFrame(df)
    assert(frame.columns.toSeq == Seq("key", "value"))
    val back = KlineIngest.parse(frame).head()
    assert(back.getAs[String]("coin") == "BTC")
    assert(back.getAs[Long]("timestamp") == 1704067200000L)
    assert(back.getAs[String]("interval") == "1m")
  }

  test("schema guard") {
    val df = Seq(("BTC", "1m")).toDF("coin", "interval")
    assert(KlineIngest.hasRequiredColumns(df))
    assert(!KlineIngest.hasRequiredColumns(df.drop("interval")))
  }

  test("compaction: many small files become few, data byte-identical") {
    val out = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // simulate 20 micro-batch appends → ≥20 files
    (1 to 20).foreach { i =>
      spark.range(i * 100L, i * 100L + 50)
        .select(col("id"), (col("id") * 2).as("v"))
        .coalesce(1).write.mode("append").parquet(out)
    }
    def files = new java.io.File(out).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    val before = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(files >= 20)
    val n = graft.sinks.Routing.compact(spark, out)
    assert(files <= n && n < 20, s"expected few files, wrote $n, have $files")
    val after = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(after == before)
  }

  test("compaction auto-detects and preserves a Hive-partitioned layout") {
    val out = java.nio.file.Files.createTempDirectory("compactp").toString + "/t"
    (1 to 6).foreach { i =>
      Seq(("BTC", "1m", i.toLong), ("ETH", "5m", i.toLong))
        .toDF("coin", "interval", "v")
        .repartition(2)
        .write.mode("append").partitionBy("coin", "interval").parquet(out)
    }
    val before = spark.read.parquet(out)
      .orderBy("coin", "interval", "v").collect().toSeq
    graft.sinks.Routing.compact(spark, out)
    // the coin=/interval= directory scheme (and so partition pruning)
    // must survive the rewrite without the caller naming the columns
    assert(new java.io.File(s"$out/coin=BTC/interval=1m").isDirectory)
    val after = spark.read.parquet(out)
      .orderBy("coin", "interval", "v").collect().toSeq
    assert(after == before)
  }
}
