package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_micros}
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

  test("domainCapStream: admits at most cap per source across batches, first arrivals win") {
    implicit val sqlCtx = spark.sqlContext
    // src A sends 3 then 2 docs, src B sends 2 — cap 4 admits A's first 4 and all of B
    val batch1 = Seq(("A", 1L, 100L), ("A", 2L, 200L), ("A", 3L, 300L), ("B", 10L, 150L))
    val batch2 = Seq(("A", 4L, 400L), ("A", 5L, 500L), ("B", 11L, 250L))
    val input = MemoryStream[(String, Long, Long)]
    input.addData(batch1: _*); input.addData(batch2: _*)
    val q = StatsStreams.domainCapStream(spark,
        input.toDF().toDF("source", "doc_id", "ts"), cap = 4)
      .writeStream.format("memory").queryName("sf_domain_cap")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val admitted = spark.table("sf_domain_cap")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // A: first 4 by (ts, doc_id) across batches = 1,2,3 then 4; doc 5 rejected
    assert(admitted === Set(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 10L), ("B", 11L)))
  }

  test("segmentDedupStream: stream (AvailableNow) == batch, first arrival survives") {
    implicit val sqlCtx = spark.sqlContext
    // 10-word segments: doc 1 = seg A + seg B, doc 2 re-sends seg A + new C,
    // doc 3 re-sends B and C — only first arrivals of each segment survive
    val segA = (1 to 10).map(i => s"a$i").mkString(" ")
    val segB = (1 to 10).map(i => s"b$i").mkString(" ")
    val segC = (1 to 10).map(i => s"c$i").mkString(" ")
    val batch1 = Seq((1L, s"$segA $segB", 1000L))
    val batch2 = Seq((2L, s"$segA $segC", 2000L))
    val batch3 = Seq((3L, s"$segB $segC", 3000L))
    val allRows = batch1 ++ batch2 ++ batch3

    val input = MemoryStream[(Long, String, Long)]
    input.addData(batch1: _*); input.addData(batch2: _*); input.addData(batch3: _*)
    val q = StatsStreams.segmentDedupStream(input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("sf_seg_dedup")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sf_seg_dedup")
      .select("seg_key", "doc_id", "seg_idx").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val batched = StatsStreams.segmentDedupStream(
        allRows.toDF("doc_id", "text", "ts").coalesce(1))
      .select("seg_key", "doc_id", "seg_idx").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(streamed === batched, "segment dedup diverged between stream and batch")
    // first arrivals: A and B from doc 1, C from doc 2 — doc 3 keeps nothing
    assert(streamed.values.toSet === Set((1L, 0L), (1L, 1L), (2L, 1L)))
    // and the streaming election matches the batch operator's kept segments
    val batchOp = graft.operators.DedupOps.segmentDedup(
      allRows.toDF("doc_id", "text", "ts").coalesce(1))
    val keptByDoc = batchOp.select("doc_id", "kept_segs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keptByDoc === Map(1L -> 2L, 2L -> 1L))
  }

  test("bpeTokenize is a STATELESS streaming face: stream == batch per row (T10)") {
    implicit val sqlCtx = spark.sqlContext
    // tokenization is a pure scan-project, so the same call runs on a
    // streaming frame unchanged (spread passes streaming inputs through)
    val rows = Seq((1L, "the band"), (2L, "standing there"))
    val merges = graft.operators.CurationOps.DemoBpeMerges
    val input = MemoryStream[(Long, String)]
    input.addData(rows: _*)
    val q = graft.operators.CurationOps.bpeTokenize(
        input.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("sp_bpe")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_bpe")
      .select("doc_id", "word_idx", "tok_idx", "token").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val batched = graft.operators.CurationOps.bpeTokenize(
        rows.toDF("doc_id", "text"), merges)
      .select("doc_id", "word_idx", "tok_idx", "token").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed === batched)
    assert(streamed.nonEmpty)
  }

  test("winnowFingerprints is a STATELESS streaming face: stream == batch per row (D9)") {
    implicit val sqlCtx = spark.sqlContext
    // selection is a pure map-side projection (spread passes streaming
    // frames through), so the same call runs on a readStream unchanged —
    // the last map-side operator without a proven streaming face
    val text1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val text2 = ((5 to 20).map(i => s"w$i") ++ Seq("x1", "x2", "x3")).mkString(" ")
    val rows = Seq((1L, text1), (2L, text2))
    val input = MemoryStream[(Long, String)]
    input.addData(rows: _*)
    val q = graft.operators.DedupOps.winnowFingerprints(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sp_winnow")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_winnow")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batched = graft.operators.DedupOps.winnowFingerprints(
        rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batched)
    assert(streamed.nonEmpty)
    // the winnowing guarantee that makes segment overlap detectable: docs
    // sharing a >= W+N-1 token run share at least one selected fingerprint
    val fp1 = streamed.collect { case (1L, fp) => fp }
    val fp2 = streamed.collect { case (2L, fp) => fp }
    assert(fp1.intersect(fp2).nonEmpty, "shared run lost its fingerprint")
  }

  test("MJPEG decode is a STATELESS streaming face: stream == batch per frame (V2)") {
    implicit val sqlCtx = spark.sqlContext
    // the codec seam is a pure per-record map over opaque blobs, so the
    // same call runs on a readStream of media records — continuous video
    // ingestion — without a separate streaming implementation
    import graft.operators.{MultimodalOps, MediaRecord}
    def rec(id: Long): MediaRecord = MediaRecord(id, "video/x-motion-jpeg",
      MultimodalOps.syntheticMjpeg(id, 16 + (id % 4).toInt, 12, 1 + (id % 3).toInt))
    val rows = Seq(rec(1L), rec(2L), rec(3L))
    val input = MemoryStream[MediaRecord]
    input.addData(rows: _*)
    val q = MultimodalOps.decodeMjpegFrames(input.toDS())
      .writeStream.format("memory").queryName("sp_mjpeg")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    def rowSet(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "frame_idx", "width", "height", "n_pixels").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    val streamed = rowSet(spark.table("sp_mjpeg"))
    val batched = rowSet(MultimodalOps.decodeMjpegFrames(
      spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[MediaRecord])))
    assert(streamed === batched)
    // fan-out sanity: doc 1 has 2 frames, doc 2 has 3, doc 3 has 1
    assert(streamed.count(_._1 == 1L) === 2)
    assert(streamed.count(_._1 == 2L) === 3)
    assert(streamed.count(_._1 == 3L) === 1)
  }

  test("vectorSearchStream: standing-query top-k merge == one-shot batch search (N1)") {
    implicit val sqlCtx = spark.sqlContext
    // the REAL corpus, arriving in three uneven prefixes; standing queries
    // are n1's (vec_id < 10) so the final report must equal cosineTopK
    val all = graft.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray))
    assert(all.length > 30, "fixture too small to split meaningfully")
    val queries = all.filter(_._1 < 10).toSeq
      .toDF("query_id", "qe")
    val splits = Seq(all.take(7), all.slice(7, 29), all.drop(29))
    val input = MemoryStream[(Long, Array[Float])]
    // the production state shape: the per-query fold is a keyed
    // flatMapGroupsWithState over the scored stream — NO driver-held map
    val keyed = StatsStreams.vectorSearchKeyedStream(
      input.toDF().toDF("vec_id", "embedding"), queries)
    assert(keyed.queryExecution.analyzed.treeString
      .contains("FlatMapGroupsWithState"),
      "vector search state is not a keyed state-store fold")
    val reports = scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Long, Double)]]()
    val q = StatsStreams.vectorSearchStream(
        input.toDF().toDF("vec_id", "embedding"), queries) { (df, _) =>
      reports += df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    }.start()
    try {
      splits.foreach { s => input.addData(s.toIndexedSeq: _*); q.processAllAvailable() }
      // state lives in the executor state store (checkpoint-recoverable),
      // sized queries × k — the zero-driver-state evidence
      val so = q.lastProgress.stateOperators
      assert(so.nonEmpty && so.exists(_.numRowsTotal == 10L),
        s"expected 10 state-store rows, got ${so.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()
    assert(reports.size === 3)
    val batch = graft.operators.AnnOps
      .cosineTopK(all.toIndexedSeq.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(reports.last === batch,
      "incremental top-k diverged from the one-shot search")
    // intermediate reports are the exact search over their own prefix
    val prefix = graft.operators.AnnOps.searchTopK(
        splits.take(2).flatten.toSeq.toDF("vec_id", "embedding"), queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(reports(1) === prefix, "mid-stream report is not the prefix-exact answer")
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

  test("stripSpansStream is a STATELESS streaming face; batch face == stripDuplicatedSpans (D13/D14)") {
    implicit val sqlCtx = spark.sqlContext
    val k = 4
    val corpus = Seq(
      (0L, "alpha bravo charlie all rights reserved by the owner delta"),
      (1L, "foxtrot golf all rights reserved by the owner hotel india"),
      (2L, "red green blue white red green blue white"),
      (3L, "one lonely sentence with nothing repeated anywhere at all"))
    val corpusDf = corpus.toDF("doc_id", "text")
    val ref = graft.operators.DedupOps.duplicatedGrams(corpusDf, k)

    // 1) with ref = the corpus's own duplicated grams, the BATCH face must
    //    reproduce stripDuplicatedSpans row-for-row (same island semantics)
    val viaStream = graft.streaming.StatsStreams.stripSpansStream(corpusDf, ref, k)
      .select("doc_id", "n_words", "removed_tokens", "clean_text")
    val viaBatch = graft.operators.DedupOps.stripDuplicatedSpans(corpusDf, k)
      .select("doc_id", "n_words", "removed_tokens", "clean_text")
    assert(viaStream.exceptAll(viaBatch).count() === 0)
    assert(viaBatch.exceptAll(viaStream).count() === 0)

    // 2) the same call on a real MemoryStream (AvailableNow) agrees with
    //    its own batch face — stateless projection, nothing batch-dependent
    val input = MemoryStream[(Long, String)]
    input.addData(corpus: _*)
    val q = graft.streaming.StatsStreams.stripSpansStream(
        input.toDF().toDF("doc_id", "text"), ref, k)
      .writeStream.format("memory").queryName("sp_spans")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_spans")
      .select("doc_id", "removed_tokens", "clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batched = viaStream
      .select("doc_id", "removed_tokens", "clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed === batched, "span strip diverged between stream and batch")
    // sanity on content: boilerplate removed cross-doc, unique doc untouched
    assert(streamed.contains((3L, 0L, "one lonely sentence with nothing repeated anywhere at all")))
    assert(streamed.exists { case (id, rm, _) => id == 0L && rm == 6L })
  }

  test("funnelStream transition counts == batch funnel stage counts; state carries across batches (A10)") {
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    def ev(u: Long, t: String, hrs: Long) = (u, t, hrs * h)
    // u1 full path; u2 click-before-view; u3 click outside 24h; u4
    // purchase-before-click; u5 non-funnel event only — same fixture
    // family as the batch spec, split MID-FUNNEL across micro-batches
    val batch1 = Seq(ev(1, "view", 1), ev(2, "click", 1), ev(3, "view", 1),
      ev(4, "view", 1), ev(4, "purchase", 2), ev(5, "error", 1))
    val batch2 = Seq(ev(1, "click", 2), ev(2, "view", 2), ev(3, "click", 27),
      ev(4, "click", 3), ev(1, "purchase", 3), ev(2, "purchase", 3),
      ev(3, "purchase", 28))
    val input = MemoryStream[(Long, String, Long)]
    input.addData(batch1: _*); input.addData(batch2: _*)
    val src = input.toDF().toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val q = StatsStreams.funnelStream(spark, src)
      .writeStream.format("memory").queryName("sp_funnel")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val transitions = spark.table("sp_funnel")
      .select("user_id", "stage", "us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val stageCounts = transitions.groupBy(_._2).view.mapValues(_.length).toMap
    // batch operator over the SAME rows — stage counts must agree
    val all = (batch1 ++ batch2)
    val batchRow = graft.operators.StatsOps.funnel(
        all.toDF("user_id", "event_type", "us")
          .select(col("user_id"), col("event_type"),
            timestamp_micros(col("us")).as("ts")))
      .collect().head
    assert(stageCounts.getOrElse("view", 0) ===
      batchRow.getLong(batchRow.fieldIndex("viewed")).toInt)
    assert(stageCounts.getOrElse("click", 0) ===
      batchRow.getLong(batchRow.fieldIndex("clicked")).toInt)
    assert(stageCounts.getOrElse("purchase", 0) ===
      batchRow.getLong(batchRow.fieldIndex("purchased")).toInt)
    // the cross-batch path: u1's click arrived a batch after its view
    assert(transitions.contains((1L, "click", 2 * h)))
    assert(transitions.contains((1L, "purchase", 3 * h)))
    // and per-user transitions are strictly stage-ordered in time
    transitions.groupBy(_._1).foreach { case (_, ts) =>
      val byStage = ts.map(t => t._2 -> t._3).toMap
      for (a <- byStage.get("view"); b <- byStage.get("click")) assert(a < b)
      for (a <- byStage.get("click"); b <- byStage.get("purchase")) assert(a < b)
    }
  }

  test("transitionsStream multiset == batch lag() transitions across batches (A12)") {
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    val evs = Seq(
      (1L, "view", 1L * h), (1L, "click", 2L * h), (1L, "view", 3L * h),
      (2L, "signup", 1L * h), (2L, "view", 5L * h),
      (3L, "error", 2L * h)).sortBy(_._3)
    val input = MemoryStream[(Long, String, Long)]
    // split mid-user: u1's third event arrives a batch later
    input.addData(evs.take(4): _*); input.addData(evs.drop(4): _*)
    val q = StatsStreams.transitionsStream(spark,
        input.toDF().toDF("user_id", "event_type", "us")
          .select(col("user_id"), col("event_type"),
            timestamp_micros(col("us")).as("ts")))
      .writeStream.format("memory").queryName("sp_trans")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_trans")
      .groupBy("prev_type", "next_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batched = graft.operators.StatsOps.eventTransitions(
        evs.zipWithIndex.map { case ((u, t, us), i) => (i.toLong, u, t, us) }
          .toDF("event_id", "user_id", "event_type", "us")
          .select(col("event_id"), col("user_id"), col("event_type"),
            timestamp_micros(col("us")).as("ts")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(r.fieldIndex("ct"))).toMap
    assert(streamed === batched, s"stream=$streamed batch=$batched")
    // the cross-batch edge: u1's view->view transition spans the split
    assert(streamed(("click", "view")) === 1L)
  }

  test("retentionStream counts == batch retention active_users across batches (R3)") {
    implicit val sqlCtx = spark.sqlContext
    val d = 86400000000L
    // u1 active days 0,1,1,3 (dup same-day); u2 joins day 1, active 1,2
    val evs = Seq(
      (1L, 0L * d), (1L, 1L * d + 7), (1L, 1L * d + 9), (2L, 1L * d),
      (2L, 2L * d), (1L, 3L * d)).sortBy(_._2)
    val input = MemoryStream[(Long, Long)]
    input.addData(evs.take(3): _*); input.addData(evs.drop(3): _*)
    val q = StatsStreams.retentionStream(spark,
        input.toDF().toDF("user_id", "us")
          .select(col("user_id"), timestamp_micros(col("us")).as("ts")))
      .writeStream.format("memory").queryName("sp_ret")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_ret")
      .groupBy("cohort_day", "day_offset").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batched = graft.operators.StatsOps.retention(
        evs.toDF("user_id", "us")
          .select(col("user_id"), timestamp_micros(col("us")).as("ts")))
      .collect().map(r => (r.getLong(r.fieldIndex("cohort_day")),
        r.getLong(r.fieldIndex("day_offset"))) ->
        r.getLong(r.fieldIndex("active_users"))).toMap
    assert(streamed === batched, s"stream=$streamed batch=$batched")
    // same-day duplicate activity emitted once; epoch-day-0 cohort legal
    assert(streamed((0L, 1L)) === 1L)
    assert(streamed((0L, 0L)) === 1L)
  }

  test("lmScoreStream is a STATELESS streaming face; batch face == lmScore bit-for-bit (T13)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "c"),
      (4L, "the data and the model go to the store"),
      (5L, "the data the data the data"))
    val corpusDf = corpus.toDF("doc_id", "text")

    // 1) scored against its own training corpus, the BATCH face must equal
    //    the batch operator row-for-row INCLUDING the quantized doubles —
    //    the integer deci-milli fold is the same sum the decimal path takes
    val viaStream = graft.streaming.StatsStreams.lmScoreStream(corpusDf, corpusDf)
      .select("doc_id", "n_bigrams", "sum_logprob", "nll")
    val viaBatch = graft.operators.TextOps.lmScore(corpusDf)
      .select("doc_id", "n_bigrams", "sum_logprob", "nll")
    assert(viaStream.exceptAll(viaBatch).count() === 0,
      s"stream face drifted:\n${viaStream.collect().mkString("\n")}\nvs\n${viaBatch.collect().mkString("\n")}")
    assert(viaBatch.exceptAll(viaStream).count() === 0)

    // 2) the same call on a real MemoryStream (AvailableNow) agrees with its
    //    own batch face, and docs with model-unseen bigrams score finite
    //    HIGH nll (add-one backoff) instead of failing
    val live = corpus :+ (9L, "zz qq zz qq zz")
    val input = MemoryStream[(Long, String)]
    input.addData(live: _*)
    val q = graft.streaming.StatsStreams.lmScoreStream(
        input.toDF().toDF("doc_id", "text"), corpusDf)
      .writeStream.format("memory").queryName("sp_lm")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_lm")
      .select("doc_id", "n_bigrams", "sum_logprob", "nll").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val batched = graft.streaming.StatsStreams.lmScoreStream(
        live.toDF("doc_id", "text"), corpusDf)
      .select("doc_id", "n_bigrams", "sum_logprob", "nll").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(streamed.size === batched.size && streamed.forall { case (k, v) => batched(k) == v },
      "lm scoring diverged between stream and batch")
    // the all-unseen doc is the WORST-scored doc in the stream
    assert(batched(9L)._3 === batched.values.map(_._3).max)
  }

  test("boilerplateStripStream is a STATELESS streaming face; batch face == boilerplateStrip row-for-row (D17)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{length => slen, col => c}
    val B = "this site uses cookies accept terms to continue reading now"
    val U0 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val U1 = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val U2 = "uniform victor whiskey xray yankee zulu one two three four"
    val corpus = Seq(
      (0L, s"$B $U0"), (1L, s"$B $U1"), (2L, s"$U2 $B"), (3L, B),
      (4L, "tiny words here"))
    val corpusDf = corpus.toDF("doc_id", "text")
      .withColumn("n_chars", slen(c("text")).cast("long"))
    val ref = graft.operators.DedupOps.boilerplateSegments(corpusDf)

    // 1) cleaned against its own corpus's boilerplate set, the BATCH face
    //    must equal the batch operator row-for-row (all docs here segment)
    val viaStream = graft.streaming.StatsStreams
      .boilerplateStripStream(corpusDf, ref)
      .select("doc_id", "n_segs", "kept_segs", "clean_text")
    val viaBatch = graft.operators.DedupOps.boilerplateStrip(corpusDf)
      .select("doc_id", "n_segs", "kept_segs", "clean_text")
    assert(viaStream.exceptAll(viaBatch).count() === 0,
      s"stream face drifted:\n${viaStream.collect().mkString("\n")}\nvs\n${viaBatch.collect().mkString("\n")}")
    assert(viaBatch.exceptAll(viaStream).count() === 0)

    // 2) the same call on a real MemoryStream (AvailableNow) agrees with its
    //    own batch face; a live doc whose text is entirely indexed
    //    boilerplate is cleaned to '' without any state store
    val live = corpus :+ (9L, s"$B $B")
    val input = MemoryStream[(Long, String)]
    input.addData(live: _*)
    val q = graft.streaming.StatsStreams.boilerplateStripStream(
        input.toDF().toDF("doc_id", "text"), ref)
      .writeStream.format("memory").queryName("sp_boiler")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_boiler")
      .select("doc_id", "n_segs", "kept_segs", "clean_text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val batched = graft.streaming.StatsStreams.boilerplateStripStream(
        live.toDF("doc_id", "text"), ref)
      .select("doc_id", "n_segs", "kept_segs", "clean_text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(streamed.size === batched.size && streamed.forall { case (k, v) => batched(k) == v },
      "boilerplate strip diverged between stream and batch")
    assert(streamed(9L) === ((2L, 0L, "")))
  }

  test("pplBucketsStream is a STATELESS streaming face; batch face == pplBuckets row-for-row (T14)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{length => slen, col => c}
    // three fluency tiers (the TextOpsSpec t14 fixture shape)
    val corpus = (1L to 4L).map(i => (i, "the data the data the data")) ++
      (5L to 8L).map(i => (i, s"the data mixes level$i tokens")) ++
      (9L to 12L).map(i => (i, s"q$i w$i e$i r$i t$i"))
    val corpusDf = corpus.toDF("doc_id", "text")
      .withColumn("n_chars", slen(c("text")).cast("long"))

    // 1) bucketed against its own corpus's thresholds, the BATCH face must
    //    equal the batch operator row-for-row (nll AND bucket)
    val viaStream = graft.streaming.StatsStreams.pplBucketsStream(corpusDf, corpusDf)
      .select("doc_id", "nll", "bucket")
    val viaBatch = graft.operators.TextOps.pplBuckets(corpusDf)
      .select("doc_id", "nll", "bucket")
    assert(viaStream.exceptAll(viaBatch).count() === 0,
      s"stream face drifted:\n${viaStream.collect().mkString("\n")}\nvs\n${viaBatch.collect().mkString("\n")}")
    assert(viaBatch.exceptAll(viaStream).count() === 0)

    // 2) a real MemoryStream run agrees with its own batch face; a live
    //    noise doc of model-unseen bigrams classifies into the TAIL
    val live = corpus :+ (99L, "zz qq zz qq zz")
    val input = MemoryStream[(Long, String)]
    input.addData(live: _*)
    val q = graft.streaming.StatsStreams.pplBucketsStream(
        input.toDF().toDF("doc_id", "text"), corpusDf)
      .writeStream.format("memory").queryName("sp_ppl")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_ppl")
      .select("doc_id", "nll", "bucket").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    val batched = graft.streaming.StatsStreams.pplBucketsStream(
        live.toDF("doc_id", "text"), corpusDf)
      .select("doc_id", "nll", "bucket").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(streamed.size === batched.size && streamed.forall { case (k, v) => batched(k) == v },
      "ppl bucketing diverged between stream and batch")
    assert(streamed(99L)._2 === "tail")
  }

  test("nbScoreStream is a STATELESS streaming face; batch face == nbQualityScore bit-for-bit (T15)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{length => slen, col => c}
    // long stopworded docs pass the t2 positive gate; short ones don't
    val corpus = Seq(
      (1L, ("the data and the model go to the store and that works fine " * 3).trim),
      (2L, "a b a b a b"), (3L, "c d"), (4L, "short noise tokens qq"),
      (5L, ("the quick brown fox jumps over the lazy dog again and again today " * 2).trim))
    val corpusDf = corpus.toDF("doc_id", "text")
      .withColumn("n_chars", slen(c("text")).cast("long"))

    // 1) scored against its own training corpus, the BATCH face must equal
    //    the batch operator row-for-row including the quantized doubles —
    //    the integer deci-milli fold is the same sum the decimal path takes
    val viaStream = graft.streaming.StatsStreams.nbScoreStream(corpusDf, corpusDf)
      .select("doc_id", "n_tokens", "log_odds", "predicted")
    val viaBatch = graft.operators.TextOps.nbQualityScore(corpusDf)
      .select("doc_id", "n_tokens", "log_odds", "predicted")
    assert(viaStream.exceptAll(viaBatch).count() === 0,
      s"stream face drifted:\n${viaStream.collect().mkString("\n")}\nvs\n${viaBatch.collect().mkString("\n")}")
    assert(viaBatch.exceptAll(viaStream).count() === 0)

    // 2) the same call on a real MemoryStream (AvailableNow) agrees with
    //    its own batch face; a doc of model-unseen words still scores
    //    finite (both-class add-one backoff)
    val live = corpus :+ (9L, "zz qq zz qq zz")
    val input = MemoryStream[(Long, String)]
    input.addData(live: _*)
    val q = graft.streaming.StatsStreams.nbScoreStream(
        input.toDF().toDF("doc_id", "text"), corpusDf)
      .writeStream.format("memory").queryName("sp_nb")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_nb")
      .select("doc_id", "n_tokens", "log_odds", "predicted").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    val batched = graft.streaming.StatsStreams.nbScoreStream(
        live.toDF("doc_id", "text"), corpusDf)
      .select("doc_id", "n_tokens", "log_odds", "predicted").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    assert(streamed.size === batched.size && streamed.forall { case (k, v) => batched(k) == v },
      "nb scoring diverged between stream and batch")
    assert(!streamed(9L)._2.isNaN && !streamed(9L)._2.isInfinite)
  }

  test("dsirScoreStream is a STATELESS streaming face; batch face == dsirWeights bit-for-bit (S10)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{length => slen, col => c}
    // long docs with stopwords pass the t2 target gate; short ones don't
    val corpus = Seq(
      (1L, ("the data and the model go to the store and that works fine " * 3).trim),
      (2L, "a b a b a b"), (3L, "c d"), (4L, "short noise tokens qq"),
      (5L, ("the quick brown fox jumps over the lazy dog again and again today " * 2).trim))
    val corpusDf = corpus.toDF("doc_id", "text").withColumn("n_chars", slen(c("text")).cast("long"))

    // 1) scored against its own training corpus, the BATCH face must equal
    //    the batch operator row-for-row including the quantized doubles
    val viaStream = graft.streaming.StatsStreams.dsirScoreStream(corpusDf, corpusDf)
      .select("doc_id", "n_feats", "weight", "gumbel", "gscore")
    val viaBatch = graft.operators.CurationOps.dsirWeights(corpusDf)
      .select("doc_id", "n_feats", "weight", "gumbel", "gscore")
    assert(viaStream.exceptAll(viaBatch).count() === 0,
      s"stream face drifted:\n${viaStream.collect().mkString("\n")}\nvs\n${viaBatch.collect().mkString("\n")}")
    assert(viaBatch.exceptAll(viaStream).count() === 0)

    // 2) the same call on a real MemoryStream (AvailableNow) agrees with its
    //    own batch face; a doc of model-unseen bigrams still scores finite
    val live = corpus :+ (9L, "zz qq zz qq zz")
    val input = MemoryStream[(Long, String)]
    input.addData(live: _*)
    val q = graft.streaming.StatsStreams.dsirScoreStream(
        input.toDF().toDF("doc_id", "text"), corpusDf)
      .writeStream.format("memory").queryName("sp_dsir")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sp_dsir")
      .select("doc_id", "n_feats", "weight", "gscore").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val batched = graft.streaming.StatsStreams.dsirScoreStream(
        live.toDF("doc_id", "text"), corpusDf)
      .select("doc_id", "n_feats", "weight", "gscore").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(streamed.size === batched.size && streamed.forall { case (k, v) => batched(k) == v },
      "dsir scoring diverged between stream and batch")
    assert(java.lang.Double.isFinite(batched(9L)._2))
  }

  test("gopherRules is a STATELESS streaming face: stream == batch per row (T12)") {
    implicit val sqlCtx = spark.sqlContext
    // the rule battery is a pure scan-projection, so the same call runs on
    // a streaming frame unchanged — live ingest quality-gating
    val rows = Seq(
      (1L, ("the data and the model go to the store and that " * 6).trim),
      (2L, "short doc"),
      (3L, (1 to 60).map(i => s"- item $i").mkString("\n")))
    val input = MemoryStream[(Long, String)]
    input.addData(rows: _*)
    val q = graft.operators.TextOps.gopherRules(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sp_gopher")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val cols = Seq("doc_id", "n_words", "r_word_count", "r_bullet_lines", "keep")
    val streamed = spark.table("sp_gopher").select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).toSet
    val batched = graft.operators.TextOps.gopherRules(rows.toDF("doc_id", "text"))
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(streamed === batched)
    assert(streamed.exists(r => r.head == 1L && r.last == true))
    assert(streamed.exists(r => r.head == 3L && r.last == false))
  }

  test("audioFingerprintStream: stream == batch, first arrival survives (M8)") {
    implicit val sqlCtx = spark.sqlContext
    // ids 7 and 263 are congruent mod 256 with equal sample counts -> same
    // decoded prefix -> same fingerprint; 8 is a different class; 30 is too
    // short for a prefix and must emit nothing
    val batch1 = Seq((7L, 200L, 1000L), (8L, 150L, 2000L))
    val batch2 = Seq((263L, 200L, 3000L), (30L, 100L, 4000L))
    val allRows = batch1 ++ batch2
    val input = MemoryStream[(Long, Long, Long)]
    input.addData(batch1: _*); input.addData(batch2: _*)
    val q = StatsStreams.audioFingerprintStream(
        input.toDF().toDF("doc_id", "n_chars", "ts"))
      .writeStream.format("memory").queryName("sf_audio_fp")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("sf_audio_fp")
      .select("prefix_key", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batched = StatsStreams.audioFingerprintStream(
        allRows.toDF("doc_id", "n_chars", "ts").coalesce(1))
      .select("prefix_key", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batched, "audio fingerprint dedup diverged")
    // 263 collapsed onto 7 (first arrival), 8 kept, 30 ineligible
    assert(streamed.values.toSet === Set(7L, 8L))
  }

  test("entityResolveStream: incremental map == batch entityResolve across mid-cluster splits (E2)") {
    implicit val sqlCtx = spark.sqlContext
    // the cluster STRADDLES micro-batches: bolt (b2) bridges belt (b1) and
    // boot (b2); melt (b3) joins via belt; record 3 (b3) LOWERS boot's
    // founding id, so the component's canonical must REVISE
    val batch1 = Seq((10L, "red belt"), (14L, "blue gear"))
    val batch2 = Seq((11L, "red bolt"), (12L, "red boot"))
    val batch3 = Seq((13L, "red melt"), (3L, "red boot"))
    val all = batch1 ++ batch2 ++ batch3
    val input = MemoryStream[(Long, String)]
    val maps = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
    val q = StatsStreams.entityResolveStream(
        input.toDF().toDF("p_partkey", "p_name")) { (m, _) =>
      maps += m.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }.start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
    } finally q.stop()
    assert(maps.size === 3)
    assert(maps(0) === Map("red belt" -> "red belt", "blue gear" -> "blue gear"))
    // bolt bridged belt(10)/bolt(11)/boot(12): canonical = min-id name
    assert(maps(1)("red boot") === "red belt")
    // id lowering revises the WHOLE component's canonical — upsert semantics
    assert(maps(2)("red belt") === "red boot")
    assert(maps(2)("red melt") === "red boot")
    assert(maps(2)("blue gear") === "blue gear")
    // parity: final map applied to every arrived record == batch e2
    val parts = all.toDF("p_partkey", "p_name")
    val expected = graft.operators.TextOps.entityResolve(parts).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val got = parts.collect()
      .map(r => (r.getLong(0), r.getString(1), maps.last(r.getString(1)))).toSet
    assert(got === expected)
  }

  test("profileMonitorStream: per-batch profile == batch profile (DQ3)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "en", "web", 120L), (2L, "de", "web", 300L),
      (3L, null.asInstanceOf[String], "books", 80L))
    val input = MemoryStream[(Long, String, String, Long)]
    input.addData(rows: _*)
    val got = scala.collection.mutable.ArrayBuffer[Set[Seq[Any]]]()
    val q = StatsStreams.profileMonitorStream(
        input.toDF().toDF("doc_id", "lang", "source", "n_chars")) { (m, _) =>
      got += m.collect().map(_.toSeq).toSet
    }.trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val batch = graft.operators.RelationalOps.columnProfile(
      rows.toDF("doc_id", "lang", "source", "n_chars"))
      .collect().map(_.toSeq).toSet
    assert(got.size === 1 && got.head === batch)
    // the planted null is counted, not crashed on
    assert(batch.exists(r => r.head == "lang" && r(2) == 1L))
  }

  test("quantileMonitorStream: exact N, quantiles within the sketch bound (KLL)") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(42L)
    val b1 = (0 until 4000).map(_ => rnd.nextGaussian() * 50.0 + 200.0)
    val b2 = (0 until 4000).map(_ => rnd.nextGaussian() * 50.0 + 500.0) // drift
    val input = MemoryStream[Double]
    val got = scala.collection.mutable.ArrayBuffer[Seq[(Double, Double, Long)]]()
    val q = StatsStreams.quantileMonitorStream(
        input.toDF().toDF("x"), "x") { (df, _) =>
      got += df.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.size === 2)
    // N is EXACT at every batch despite constant sketch state
    assert(got(0).forall(_._3 === 4000L) && got(1).forall(_._3 === 8000L))
    // quantile values within the 3% rank bound of the exact union
    val all = (b1 ++ b2).sorted
    got(1).foreach { case (qq, est, _) =>
      val rank = all.count(_ < est)
      assert(math.abs(rank - qq * all.size) <= 0.03 * all.size,
        s"q=$qq est=$est rank=$rank")
    }
    // the drift is VISIBLE: the median moved up after batch 2
    val med1 = got(0).find(_._1 == 0.5).get._2
    val med2 = got(1).find(_._1 == 0.5).get._2
    assert(med2 > med1 + 50.0, s"median $med1 -> $med2 missed the drift")
  }

  test("fkMonitorStream: per-batch orphan audit == fkCheck; dim refresh picked up (DQ7)") {
    implicit val sqlCtx = spark.sqlContext
    var dim = Seq(1L, 2L).toDF("pk")
    val input = MemoryStream[Long]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val q = StatsStreams.fkMonitorStream(
        input.toDF().toDF("fk"), "fk", dim, "pk", "fact.fk->dim") { (df, _) =>
      val r = df.head
      got += ((r.getLong(1), r.getLong(2), r.getBoolean(3)))
    }.start()
    try {
      input.addData(1L, 2L, 7L); q.processAllAvailable() // 7 is an orphan
      dim = Seq(1L, 2L, 7L).toDF("pk")                   // dim refreshed
      input.addData(7L, 2L); q.processAllAvailable()     // 7 now resolves
    } finally q.stop()
    assert(got.toSeq === Seq((3L, 1L, false), (2L, 0L, true)))
  }

  test("attributionStream: frozen + live partials == batch a14 across finalization (A14)") {
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    def ev(id: Long, user: Long, tpe: String, us: Long, value: Double, k: Long) =
      (id, new java.sql.Timestamp(us / 1000), user, tpe, value, s"""{"k":$k}""")
    // batch 1: user 1's journey completes (2 touches + purchase);
    // batch 2: a LATE view lands inside user 2's live purchase lookback
    //   (revises its touch count) and the ref advances 3 days, freezing
    //   user 1's purchase into the decimal accumulators;
    // batch 3: a new journey for user 3 after the freeze
    val b1 = Seq(
      ev(1, 1, "view", 10 * h, 0.0, 0), ev(2, 1, "view", 11 * h, 0.0, 1),
      ev(3, 1, "purchase", 12 * h, 50.0, 9),
      ev(4, 2, "view", 13 * h, 0.0, 2), ev(5, 2, "purchase", 14 * h, 30.0, 9))
    val b2 = Seq(
      ev(6, 2, "view", 13 * h + 1, 0.0, 3), // late view, revises user 2
      ev(7, 9, "view", 84 * h, 0.0, 4))     // ref -> 84h: user 1 freezes
    val b3 = Seq(
      ev(8, 3, "view", 85 * h, 0.0, 0), ev(9, 3, "purchase", 86 * h, 20.0, 9))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    def asEvents(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = scala.collection.mutable.ArrayBuffer[Map[Long, Seq[Any]]]()
    val q = StatsStreams.attributionStream(asEvents(input.toDF())) { (df, _) =>
      got += df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.size === 3)
    def batchOf(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      graft.operators.StatsOps.attribution(asEvents(rows.toDF()))
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // parity at every arrival prefix — including the batch where user 2's
    // attribution is REVISED by the late view and user 1's is frozen
    assert(got(0) === batchOf(b1))
    assert(got(1) === batchOf(b1 ++ b2))
    assert(got(2) === batchOf(b1 ++ b2 ++ b3))
    // the late view took half of user 2's purchase from ch2 to ch3
    assert(got(1)(2L) !== got(0)(2L))
  }

  test("freshnessStream: compacted state stays exact — final report == batch dq5 (DQ5)") {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    // batch 2 advances the global ref by 3 days: stream b goes stale and
    // its rows compact irreversibly into the per-stream scalars — yet it
    // must keep appearing in every report (growing lag, zero last-day)
    val b1 = Seq(("a", 1L * day), ("a", 1L * day + 5L), ("b", 1L * day + 10L))
    val b2 = Seq(("a", 4L * day), ("a", 4L * day - 100L))
    val input = MemoryStream[(String, Long)]
    def asEvents(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("event_type"), timestamp_micros(col("_2")).as("ts"))
    val got = scala.collection.mutable.ArrayBuffer[Set[Seq[Any]]]()
    val q = StatsStreams.freshnessStream(asEvents(input.toDF())) { (df, _) =>
      got += df.collect().map(_.toSeq).toSet
    }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.size === 2)
    // batch parity at each prefix of the arrival order
    val exp1 = graft.operators.RelationalOps.freshness(asEvents(b1.toDF()))
      .collect().map(_.toSeq).toSet
    val exp2 = graft.operators.RelationalOps.freshness(
        asEvents((b1 ++ b2).toDF()))
      .collect().map(_.toSeq).toSet
    assert(got(0) === exp1)
    assert(got(1) === exp2)
    // the stale stream is still reported: compacted scalars, not dropped
    assert(got(1).exists(r =>
      r.head == "b" && r(4) == 0L && r(2) == 3L * day - 10L))
  }

  test("volumeAnomalyStream: daily-count state is sufficient — final report == batch dq6 (DQ6)") {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    // day 1 of stream x STRADDLES the two micro-batches: the state merge
    // must sum the split counts, not keep two rows
    val b1 = Seq(("x", 1L), ("x", 2L), ("x", day + 1L), ("y", 5L))
    val b2 = Seq(("x", day + 2L), ("x", 2 * day + 1L), ("x", 2 * day + 2L),
      ("x", 2 * day + 3L), ("y", day + 5L))
    val input = MemoryStream[(String, Long)]
    def asEvents(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("event_type"), timestamp_micros(col("_2")).as("ts"))
    val got = scala.collection.mutable.ArrayBuffer[Set[Seq[Any]]]()
    val q = StatsStreams.volumeAnomalyStream(asEvents(input.toDF())) { (df, _) =>
      got += df.collect().map(_.toSeq).toSet
    }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.size === 2)
    val exp1 = graft.operators.RelationalOps.volumeAnomaly(asEvents(b1.toDF()))
      .collect().map(_.toSeq).toSet
    val exp2 = graft.operators.RelationalOps.volumeAnomaly(
        asEvents((b1 ++ b2).toDF()))
      .collect().map(_.toSeq).toSet
    assert(got(0) === exp1)
    assert(got(1) === exp2)
    // the straddled day merged: exactly one row for (x, day 1), count 2
    assert(got(1).exists(r => r.head == "x" && r(1) == 1L && r(2) == 2L))
  }

  test("qualityMonitorStream: per-batch battery == batch checks, violations gate (DQ1)") {
    implicit val sqlCtx = spark.sqlContext
    // batch 1 is clean; batch 2 plants one violation of each kind
    // one planted violation of each kind, delivered as ONE micro-batch
    // (per-batch gating semantics need the dup pair to arrive together)
    val dirty = Seq(
      (1L, "x" * 80, 80L), (2L, "y" * 100, 100L), // clean rows
      (3L, "z" * 70, 70L), (3L, "w" * 90, 90L),   // duplicate doc_id
      (4L, "short", 5L),                           // under min length
      (5L, "a" * 80, 70L))                         // n_chars inconsistent (only)
    val input = MemoryStream[(Long, String, Long)]
    input.addData(dirty: _*)
    val reports = scala.collection.mutable.Map[Long, Map[String, Long]]()
    val q = StatsStreams.qualityMonitorStream(
        input.toDF().toDF("doc_id", "text", "n_chars")) { (df, id) =>
      reports(id) = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }.trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val rep = reports.values.head
    assert(rep("doc_id_unique") === 1L)
    assert(rep("documents_min_length") === 1L)
    assert(rep("n_chars_consistent") === 1L)
    assert(rep("text_not_null") === 0L)
    // stream face == batch operator on the same rows
    val batchRep = graft.operators.RelationalOps.documentQualityChecks(
        dirty.toDF("doc_id", "text", "n_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep === batchRep)
    // and a clean frame reports all zeros through the same shared battery
    val cleanRep = graft.operators.RelationalOps.documentQualityChecks(
        Seq((9L, "q" * 80, 80L)).toDF("doc_id", "text", "n_chars"))
      .collect().map(r => r.getLong(1))
    assert(cleanRep.forall(_ === 0L))
  }

  test("incrementalDedupStream: per-micro-batch triage == batch operator (D19)") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val hist2 = "papa quebec romeo sierra tango uniform victor whiskey xray yankee"
    val history = Seq(
      (0L, base), (2L, hist2),
      (4L, "mike november oscar kilo lima golfing echoes"), (6L, base))
      .map { case (id, t) => (id, t, t.replace(" ", "").length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    // incoming split across TWO micro-batches: exact dup, near dup, novel
    val batch1 = Seq((1L, base), (3L, hist2.replace("yankee", "zulu")))
    val batch2 = Seq((5L, "one two three four five six seven"), (7L, base))
    val toRow = (p: (Long, String)) => (p._1, p._2, p._2.replace(" ", "").length.toLong)

    val input = MemoryStream[(Long, String, Long)]
    input.addData(batch1.map(toRow): _*); input.addData(batch2.map(toRow): _*)
    val got = scala.collection.mutable.Map[Long, (String, Option[Long])]()
    val q = StatsStreams.incrementalDedupStream(
        input.toDF().toDF("doc_id", "text", "n_chars"), history) { (df, _) =>
      df.collect().foreach(r => got(r.getLong(0)) =
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
    }.trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()

    val batched = graft.operators.DedupOps.incrementalDedupOf(
        (batch1 ++ batch2).map(toRow).toDF("doc_id", "text", "n_chars"), history)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(got.toMap === batched, "stream triage diverged from the batch operator")
    assert(got(1L) === (("exact", Some(0L))))
    assert(got(3L)._1 === "near")
    assert(got(5L) === (("novel", None)))
    assert(got(7L) === (("exact", Some(0L))))
  }
}
