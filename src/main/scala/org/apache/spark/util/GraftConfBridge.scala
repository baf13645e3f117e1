package org.apache.spark.util

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast

/** Package bridge (same pattern as [[org.apache.spark.sql.GraftColumnBridge]]):
  * `SerializableConfiguration` is `private[spark]`, but executor-side
  * Hadoop FileSystem access in closures needs the driver's
  * configuration shipped along. This exposes the broadcast helper.
  */
object GraftConfBridge {
  def broadcastConf(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)

  def value(b: Broadcast[SerializableConfiguration]): org.apache.hadoop.conf.Configuration =
    b.value.value
}
