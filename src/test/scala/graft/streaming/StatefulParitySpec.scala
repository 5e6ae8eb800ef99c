package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Batch/stream parity for the STATEFUL streaming faces (the round-4 verdict's
  * companion to WindowVariantsSpec's stateless proofs): the same rows, fed as
  * a MemoryStream and drained with Trigger.AvailableNow, must keep exactly the
  * rows the batch operator keeps — and the SURVIVOR of each duplicate group is
  * pinned to the first arrival in both modes. Reference parity: the
  * reference's keyed dedup is order-dependent the same way (first visit of the
  * day wins, app/dwm/UniqueVisitApp.java:54-102), so "which row survives" is
  * part of the operator contract, not an implementation accident.
  */
class StatefulParitySpec extends SparkSpec {
  import spark.implicits._

  test("dedupExactStream: stream (AvailableNow) == batch, first arrival survives") {
    implicit val sqlCtx = spark.sqlContext
    // duplicate fingerprints spread across arrival batches; ids encode order
    val batch1 = Seq((1L, "same text", 1000L), (2L, "other text", 2000L))
    val batch2 = Seq((3L, "same text", 3000L), (4L, "third text", 4000L))
    val batch3 = Seq((5L, "other text", 5000L), (6L, "same text", 6000L))
    val allRows = batch1 ++ batch2 ++ batch3

    val input = MemoryStream[(Long, String, Long)]
    input.addData(batch1: _*); input.addData(batch2: _*); input.addData(batch3: _*)
    val q = StatsStreams.dedupExactStream(input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("sf_dedup")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sf_dedup")
      .select("fingerprint", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // batch face on the same rows in arrival order (one partition pins
    // dropDuplicates' "first row per key" to the arrival order)
    val batched = StatsStreams.dedupExactStream(
        allRows.toDF("doc_id", "text", "ts").coalesce(1))
      .select("fingerprint", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(streamed === batched, "stateful dedup diverged between stream and batch")
    // survivor pinning: the FIRST arrival of each duplicate group wins
    assert(streamed.values.toSet === Set(1L, 2L, 4L))
  }

  test("embeddingDedupStream: stream (AvailableNow) == batch, first arrival survives") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val (a, b, c) = (vec(), vec(), vec())
    // same-signature (identical) vectors recur across batches
    val batch1 = Seq((1L, a, 1000L), (2L, b, 2000L))
    val batch2 = Seq((3L, a, 3000L), (4L, c, 4000L))
    val batch3 = Seq((5L, b, 5000L))
    val allRows = batch1 ++ batch2 ++ batch3

    val input = MemoryStream[(Long, Array[Float], Long)]
    input.addData(batch1: _*); input.addData(batch2: _*); input.addData(batch3: _*)
    val q = StatsStreams.embeddingDedupStream(input.toDF().toDF("vec_id", "embedding", "ts"))
      .writeStream.format("memory").queryName("sf_vec_dedup")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sf_vec_dedup")
      .select("lsh_sig", "vec_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val batched = StatsStreams.embeddingDedupStream(
        allRows.toDF("vec_id", "embedding", "ts").coalesce(1))
      .select("lsh_sig", "vec_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(streamed === batched, "embedding dedup diverged between stream and batch")
    assert(streamed.values.toSet === Set(1L, 2L, 4L))
  }
}
