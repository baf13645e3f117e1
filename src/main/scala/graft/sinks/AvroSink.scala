package graft.sinks

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Avro file sink (reference §2.2 `sink_avro_hdfs`,
  * /root/reference/spark/streaming-shorttime.py:73-78).
  *
  * This distribution ships avro-core but not the spark-avro DataSource
  * module, so the sink is built directly on Avro's container-file
  * writer: each task serializes ITS OWN partition to one
  * `part-<pid>.avro` — the same executor-parallel, no-driver-funnel
  * shape as a DataSource sink. Flat primitive schemas only (the kline
  * record is exactly that); nested types belong in parquet.
  *
  * Unlike the reference, which creates a fresh directory per
  * micro-batch (`coin_shorttime_batch_{id}` — unbounded small-dir
  * growth), callers append task files into one directory per stream.
  */
object AvroSink {

  /** Spark → Avro schema for a flat row of primitives (nullable unions). */
  def avroSchema(schema: StructType, name: String = "record"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case StringType  => Schema.create(Schema.Type.STRING)
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case TimestampType | TimestampNTZType =>
          Schema.create(Schema.Type.LONG) // epoch micros
        case other => throw new IllegalArgumentException(
          s"AvroSink supports flat primitive schemas; got $other for ${f.name}")
      }
      if (f.nullable) {
        val union = Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base))
        fs.name(f.name).`type`(union).withDefault(null)
      } else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  /** Write `df` as Avro container files under `dir`, one file per
    * partition, executor-parallel. */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val names = df.schema.fieldNames
    val types = df.schema.fields.map(_.dataType)
    new java.io.File(dir).mkdirs()
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, new java.io.File(s"$dir/part-$pid.avro"))
        try rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            val v = if (row.isNullAt(i)) null else types(i) match {
              case TimestampType =>
                java.lang.Long.valueOf(row.getTimestamp(i).getTime * 1000L)
              case TimestampNTZType =>
                java.lang.Long.valueOf(
                  row.getAs[java.time.LocalDateTime](i)
                    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
              case StringType => row.getString(i)
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
            rec.put(names(i), v)
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }
}
