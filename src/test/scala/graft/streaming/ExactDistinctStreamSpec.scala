package graft.streaming

import graft.SparkSpec
import graft.functions.ExactDistinct
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ExactDistinctStreamSpec extends SparkSpec {
  import spark.implicits._

  test("exact windowed distinct count in append-mode streaming (A3 exact path)") {
    // the library Aggregator, exercised end-to-end through a streaming window
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (order_id, ts_millis)
    val agg = input.toDF().toDF("order_id", "ts_ms")
      .withColumn("rt", timestamp_millis(col("ts_ms")))
      .withWatermark("rt", "1 second")
      .groupBy(window(col("rt"), "10 seconds"))
      .agg(ExactDistinct(col("order_id")).as("order_count"))
    val q = agg.writeStream.format("memory").queryName("exact_distinct")
      .outputMode("append").start()
    try {
      input.addData((1L, 1000L), (1L, 2000L), (2L, 3000L), (1L, 9000L))
      q.processAllAvailable()
      input.addData((9L, 60000L)) // advance watermark, close window [0,10s)
      q.processAllAvailable()
      val rows = spark.table("exact_distinct").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("order_count") === 2L) // ids {1, 2}, exact
    } finally q.stop()
  }
}
