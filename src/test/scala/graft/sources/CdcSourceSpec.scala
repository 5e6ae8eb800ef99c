package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot-then-tail: seeded state arrives before live changes (S1 initial)") {
    val topic = Files.createTempDirectory("cdc_topic").toString
    // phase 1: snapshot of the current table state
    val snapshot = Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
    CdcSource.seedSnapshot(snapshot, "g", "user_info", topic)

    val out = Files.createTempDirectory("cdc_out").toString
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    val q = CdcSource.tail(spark, topic)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val phase1 = spark.read.parquet(out)
      assert(phase1.count() === 2)            // snapshot visible
      assert(phase1.select("type").distinct().head.getString(0) === "insert")

      // phase 2: live binlog tail (update + delete)
      Files.writeString(Paths.get(s"$topic/live1.json"), Seq(
        """{"database":"g","tableName":"user_info","before":null,"after":"{\"id\":\"1\",\"name\":\"alice2\"}","type":"update"}""",
        """{"database":"g","tableName":"user_info","before":null,"after":"{\"id\":\"2\"}","type":"delete"}""")
        .mkString("\n"))
      q.processAllAvailable()
      val all = spark.read.parquet(out)
      assert(all.count() === 3)               // delete filtered (P3), update tailed
      assert(all.filter(col("type") === "update").count() === 1)
    } finally q.stop()
  }
}
