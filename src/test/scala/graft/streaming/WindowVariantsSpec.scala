package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class WindowVariantsSpec extends SparkSpec {
  import spark.implicits._

  test("sliding windows emit one pane per slide covering each event") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = StatsStreams.slidingEventCounts(
        input.toDF().toDF("key", "ts"), "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("sliding").outputMode("append").start()
    try {
      input.addData(("a", 7000L)) // lives in panes [0,10) and [5,15)
      q.processAllAvailable()
      input.addData(("z", 100000L))
      q.processAllAvailable()
      val panes = spark.table("sliding").filter(col("key") === "a")
        .select("stt").collect().map(_.getString(0)).toSet
      assert(panes === Set("1970-01-01 00:00:00", "1970-01-01 00:00:05"))
    } finally q.stop()
  }

  test("session windows merge events within the gap, split across it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val q = StatsStreams.sessionCounts(
        input.toDF().toDF("key", "ts", "value"), "10 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // one session: 1s,5s,12s (each within 10s of previous); second session at 60s
      input.addData(("m", 1000L, 1.0), ("m", 5000L, 2.0), ("m", 12000L, 3.0),
        ("m", 60000L, 4.0))
      q.processAllAvailable()
      input.addData(("z", 300000L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").filter(col("key") === "m")
        .collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4)))
      assert(rows.length === 2, rows.mkString(","))
      val bySize = rows.sortBy(-_._2)
      assert(bySize.head._2 === 3L && bySize.head._3 === 6.0) // merged session
      assert(bySize(1)._2 === 1L && bySize(1)._3 === 4.0)
    } finally q.stop()
  }

  test("streaming IVF assignment: vectors get their nearest centroid cell, map-side") {
    implicit val sqlCtx = spark.sqlContext
    val cents = Array(
      (0, Array.tabulate(3)(i => if (i == 0) 1.0f else 0.0f)),
      (1, Array.tabulate(3)(i => if (i == 1) 1.0f else 0.0f)))
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.operators.AnnOps.assignCellsLit(
        input.toDF().toDF("vec_id", "embedding"), cents)
      .select("vec_id", "assigned_cell")
      .writeStream.format("memory").queryName("ivf_assign").outputMode("append").start()
    try {
      input.addData((1L, Array(0.9f, 0.1f, 0.0f)), (2L, Array(0.1f, 0.9f, 0.0f)))
      q.processAllAvailable()
      input.addData((3L, Array(0.6f, 0.5f, 0.0f))) // closer to centroid 0
      q.processAllAvailable()
      val got = spark.table("ivf_assign").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got === Map(1L -> 0, 2L -> 1, 3L -> 0))
    } finally q.stop()
  }

  test("streaming embedding dedup collapses same-signature vectors, keeps distinct ones") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val (a, b) = (vec(), vec())
    val input = MemoryStream[(Long, Array[Float], Long)]
    val q = StatsStreams.embeddingDedupStream(
        input.toDF().toDF("vec_id", "embedding", "ts"))
      .writeStream.format("memory").queryName("vec_dedup").outputMode("append").start()
    try {
      input.addData((1L, a, 1000L), (2L, b, 2000L))
      q.processAllAvailable()
      input.addData((3L, a, 3000L)) // identical vector, later batch → same signature
      q.processAllAvailable()
      val ids = spark.table("vec_dedup").select("vec_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }

  test("streaming decontamination flags overlap against a static bench, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "held out benchmark prompt text here")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = StatsStreams.decontaminateStream(input.toDF().toDF("doc_id", "text"), bench)
    val q = out.writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "contains the held out benchmark prompt inside"), // shares shingles
        (2L, "completely unrelated clean document text"),
        (3L, "too short")) // < 3 words of overlap structure, empty shingles
      q.processAllAvailable()
      val rows = spark.table("decon_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(rows(1L)._1 >= 1 && !rows(1L)._2, "overlapping doc must be flagged")
      assert(rows(2L) === ((0L, true)))
      assert(rows(3L) === ((0L, true)))
      // batch face agrees with the streaming face on the same inputs
      val batch = StatsStreams.decontaminateStream(
        Seq((1L, "contains the held out benchmark prompt inside"),
          (2L, "completely unrelated clean document text"),
          (3L, "too short")).toDF("doc_id", "text"), bench)
      assert(batch.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap === rows)
    } finally q.stop()
  }

  test("stateless text/curation operators run unchanged on streams, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{CurationOps, TextOps}
    val rows = (0L to 49L).map(i => (i, s"alpha beta gamma delta epsilon word$i text", 40L))
    val ops: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      ("pii", TextOps.piiRedact _),
      ("norm", TextOps.normalizeText _),
      ("rep", TextOps.repetitionStats _),
      ("chunk", CurationOps.chunkDocuments(_: org.apache.spark.sql.DataFrame)))
    for ((name, op) <- ops) {
      val input = MemoryStream[(Long, String, Long)]
      val q = op(input.toDF().toDF("doc_id", "text", "n_chars"))
        .writeStream.format("memory").queryName(s"op_$name").outputMode("append").start()
      try {
        input.addData(rows: _*)
        q.processAllAvailable()
        val streamed = spark.table(s"op_$name").collect().map(_.toString).sorted.toSeq
        val batch = op(rows.toDF("doc_id", "text", "n_chars"))
          .collect().map(_.toString).sorted.toSeq
        assert(streamed === batch, s"operator $name diverged between stream and batch")
        assert(streamed.nonEmpty)
      } finally q.stop()
    }
  }

  test("stratified hash sampling runs unchanged on a stream (pure predicate)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    // the batch operator applied verbatim to a streaming frame: broadcast
    // rate join + per-row predicate are stateless, so no watermark needed
    val out = graft.operators.CurationOps.hashSample(
      input.toDF().toDF("doc_id", "source", "lang"))
    val q = out.writeStream.format("memory").queryName("sample_stream")
      .outputMode("append").start()
    try {
      input.addData((0L to 99L).map(i => (i, "s", "en")): _*)
      q.processAllAvailable()
      val streamed = spark.table("sample_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val batch = graft.operators.CurationOps.hashSample(
        (0L to 99L).map(i => (i, "s", "en")).toDF("doc_id", "source", "lang"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty && streamed.size < 100) // en rate = 50%
    } finally q.stop()
  }

  test("streaming exact dedup keeps the first occurrence per fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = StatsStreams.dedupExactStream(
        input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData((1L, "same text", 1000L), (2L, "other text", 2000L))
      q.processAllAvailable()
      input.addData((3L, "same text", 3000L)) // duplicate content, later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }
}
