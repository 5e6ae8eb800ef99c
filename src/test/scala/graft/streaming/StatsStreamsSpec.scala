package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class LogRow(mid: String, vc: String, ch: String, ar: String,
    is_new: String, during_time: Long, ts: Long)

class StatsStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def toPagesDf(input: MemoryStream[LogRow]) =
    input.toDF().select(
      struct(col("mid"), col("vc"), col("ch"), col("ar"), col("is_new")).as("common"),
      struct(col("during_time")).as("page"),
      col("ts"))

  test("visitorStats: 10s tumbling windows close on watermark; late rows dropped (A1/W1/W3)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogRow]
    val q = StatsStreams.visitorStats(toPagesDf(input))
      .writeStream.format("memory").queryName("vstats").outputMode("append").start()
    try {
      input.addData(
        LogRow("m1", "v1", "app", "110000", "1", 100L, 1000L),
        LogRow("m2", "v1", "app", "110000", "1", 200L, 5000L),
        LogRow("m3", "v1", "web", "110000", "0", 50L, 12000L))
      q.processAllAvailable()
      // advance watermark beyond 10s window + 11s delay
      input.addData(LogRow("mX", "v9", "x", "0", "0", 1L, 60000L))
      q.processAllAvailable()
      input.addData(LogRow("m4", "v1", "app", "110000", "1", 999L, 2000L)) // late → dropped
      q.processAllAvailable()
      input.addData(LogRow("mY", "v9", "x", "0", "0", 1L, 120000L))
      q.processAllAvailable()
      val rows = spark.table("vstats").collect()
      val appWin0 = rows.find(r => r.getAs[String]("ch") == "app" &&
        r.getAs[String]("stt") == "1970-01-01 00:00:00").get
      assert(appWin0.getAs[Long]("pv_ct") === 2L)   // late m4 NOT counted
      assert(appWin0.getAs[Long]("dur_sum") === 300L)
      assert(appWin0.getAs[String]("edt") === "1970-01-01 00:00:10")
      val webWin1 = rows.find(r => r.getAs[String]("ch") == "web").get
      assert(webWin1.getAs[String]("stt") === "1970-01-01 00:00:10")
    } finally q.stop()
  }

  test("keywordStats tokenizes and counts per window (A4/X1)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = StatsStreams.keywordStats(input.toDF().toDF("full_word", "ts"))
      .writeStream.format("memory").queryName("kstats").outputMode("append").start()
    try {
      input.addData(("spark hash join", 1000L), ("hash   agg", 2000L))
      q.processAllAvailable()
      input.addData(("zzz", 60000L))
      q.processAllAvailable()
      val m = spark.table("kstats").collect()
        .map(r => r.getAs[String]("keyword") -> r.getAs[Long]("ct")).toMap
      assert(m("hash") === 2L)
      assert(m("spark") === 1L)
      assert(!m.contains(""))
    } finally q.stop()
  }
}
