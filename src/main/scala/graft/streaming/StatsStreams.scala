package graft.streaming

import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DWS windowed streaming aggregations (SURVEY §2.5/§2.6) — the streaming
  * twins of [[graft.operators.StatsOps]], with the reference's exact window
  * and watermark widths.
  *
  * Scale notes: windowed streaming aggs keep incremental per-(key, window)
  * state with partial aggregation on the map side; watermark closes windows
  * and evicts state (the reference's window-close finisher + state purge,
  * app/dws/VisitorStatsApp.java:158-198). Exact streaming count-distinct is
  * not supported in append mode — the engine offers approx_count_distinct in
  * stream mode and exact distinct in batch mode (SURVEY §7.4.1).
  */
object StatsStreams {

  /** A1/W1/W3 — VisitorStats: 10s tumbling event-time window keyed by
    * (vc, ch, ar, is_new), 11s watermark (app/dws/VisitorStatsApp.java:133-198).
    * Input columns: common struct + page struct + ts (millis).
    */
  def visitorStats(pages: DataFrame): DataFrame =
    pages
      .select(col("common.vc").as("vc"), col("common.ch").as("ch"),
        col("common.ar").as("ar"), col("common.is_new").as("is_new"),
        col("page.during_time").as("during_time"),
        timestamp_millis(col("ts")).as("event_time"))
      .withWatermark("event_time", "11 seconds")
      .groupBy(window(col("event_time"), "10 seconds"),
        col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(count(lit(1)).as("pv_ct"), sum(col("during_time")).as("dur_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("vc"), col("ch"), col("ar"), col("is_new"),
        col("pv_ct"), col("dur_sum"))

  /** A1 full shape — the reference's VisitorStats is a UNION of three
    * normalized streams (page views, unique visits, user jumps:
    * app/dws/VisitorStatsApp.java:65-129) windowed together, each input
    * setting one metric column. Inputs share the key columns
    * (vc, ch, ar, is_new) + metric columns (uv_ct, pv_ct, sv_ct, uj_ct,
    * dur_sum) + ts millis; this unions and sums per 10s window (reduce at
    * :160-182, finisher stamping stt/edt at :183-198).
    */
  def visitorStatsUnion(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_ unionByName _)
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "11 seconds")
      .groupBy(window(col("event_time"), "10 seconds"),
        col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(sum("uv_ct").as("uv_ct"), sum("pv_ct").as("pv_ct"),
        sum("sv_ct").as("sv_ct"), sum("uj_ct").as("uj_ct"),
        sum("dur_sum").as("dur_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("vc"), col("ch"), col("ar"), col("is_new"),
        col("uv_ct"), col("pv_ct"), col("sv_ct"), col("uj_ct"), col("dur_sum"))

  /** A3/W2/W5 — ProvinceStats streaming: 10s tumbling window × province with
    * order count + amount (app/dws/ProvinceStatsSQLApp.java:112-132). Streaming
    * append mode cannot do exact count(distinct) — approx_count_distinct is
    * used here; the batch path (StatsOps.provinceStats) is exact.
    * Input columns: province_id, province_name, order_id, split_total_amount,
    * create_ts (millis).
    */
  def provinceStats(orders: DataFrame): DataFrame =
    orders
      .withColumn("rt", timestamp_millis(col("create_ts")))
      .withWatermark("rt", "1 second")
      .groupBy(window(col("rt"), "10 seconds"), col("province_id"), col("province_name"))
      .agg(approx_count_distinct(col("order_id")).as("order_count"),
        dsum(col("split_total_amount")).as("order_amount"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("province_id"), col("province_name"), col("order_count"), col("order_amount"))

  /** A3 exact path — same query with EXACT windowed distinct via the typed
    * [[graft.functions.ExactDistinct]] Aggregator (the reference's exact
    * count(distinct) semantics); choose this when per-window distinct
    * cardinality is bounded, the approx variant otherwise.
    */
  def provinceStatsExact(orders: DataFrame): DataFrame =
    orders
      .withColumn("rt", timestamp_millis(col("create_ts")))
      .withWatermark("rt", "1 second")
      .groupBy(window(col("rt"), "10 seconds"), col("province_id"), col("province_name"))
      .agg(graft.functions.ExactDistinct(col("order_id")).as("order_count"),
        dsum(col("split_total_amount")).as("order_amount"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("province_id"), col("province_name"), col("order_count"), col("order_amount"))

  /** A3 bounded-state path — same query with the [[graft.functions.HllSketch]]
    * sketch kept as a column: per-(window, province) state is a constant
    * 4 KiB regardless of distinct-order cardinality (the shape that survives
    * unbounded keys at 100 TB), the emitted count is the sketch estimate,
    * and the persisted sketch re-aggregates (day→week, province→country)
    * via [[graft.functions.HllMergeCount]] without rescanning events.
    */
  def provinceStatsHll(orders: DataFrame): DataFrame =
    orders
      .withColumn("rt", timestamp_millis(col("create_ts")))
      .withWatermark("rt", "1 second")
      .groupBy(window(col("rt"), "10 seconds"), col("province_id"), col("province_name"))
      .agg(graft.functions.HllSketch(col("order_id")).as("order_count_sketch"),
        dsum(col("split_total_amount")).as("order_amount"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("province_id"), col("province_name"),
        graft.functions.HllSketchEstimate(col("order_count_sketch")).as("order_count"),
        col("order_count_sketch"), col("order_amount"))

  /** Beyond the reference (SURVEY §2.6 NOT-PRESENT row): sliding-window
    * variant of visitor counts — same aggregation over `window(size, slide)`.
    * The reference rejects sliding windows only because its mutable-bean
    * reduce can't share state across panes (VisitorStatsApp.java:174);
    * Spark's immutable agg buffers have no such constraint.
    */
  def slidingEventCounts(events: DataFrame, size: String, slide: String): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "11 seconds")
      .groupBy(window(col("event_time"), size, slide), col("key"))
      .agg(count(lit(1)).as("ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("key"), col("ct"))

  /** Beyond the reference: session windows (gap-based) — the natural model
    * for the reference's per-mid visit sessions (UserJump's 10s horizon is a
    * hand-rolled session boundary). State closes when a key is idle past the
    * gap + watermark.
    */
  def sessionCounts(events: DataFrame, gap: String): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "11 seconds")
      .groupBy(session_window(col("event_time"), gap), col("key"))
      .agg(count(lit(1)).as("ct"), sum(col("value")).as("value_sum"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("key"), col("ct"), col("value_sum"))

  /** Streaming exact dedup by content hash — the streaming face of the batch
    * D1 operator: first occurrence wins; `dropDuplicatesWithinWatermark`
    * bounds per-fingerprint state to the watermark horizon (plain
    * `dropDuplicates` on a non-event-time key never evicts).
    */
  def dedupExactStream(docs: DataFrame): DataFrame = {
    val fp = docs
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("event_time", "1 hour")
    if (fp.isStreaming) fp.dropDuplicatesWithinWatermark("fingerprint")
    else fp.dropDuplicates("fingerprint")
  }

  /** Streaming embedding near-dup dedup — the streaming face of the vector
    * dedup family (batch d6/n3): the dedup key is the full 32-bit SRP-LSH
    * signature ([[graft.operators.AnnOps.lshSignature]], deterministic
    * md5-parity hyperplanes), so vectors whose projection signs agree on all
    * 32 hyperplanes — cosine ≈ 1 w.h.p. — collapse to the first arrival.
    * Signature extraction is map-side (32 codegen'd dot products per
    * vector); dedup state is one row per distinct signature, evicted at the
    * watermark horizon like [[dedupExactStream]]'s fingerprint state, so
    * state never grows with corpus size — only with the live window's
    * signature cardinality.
    */
  def embeddingDedupStream(vectors: DataFrame): DataFrame = {
    val sig = vectors
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withColumn("lsh_sig",
        graft.operators.AnnOps.lshSignature(col("embedding")))
      .withWatermark("event_time", "1 hour")
    if (sig.isStreaming) sig.dropDuplicatesWithinWatermark("lsh_sig")
    else sig.dropDuplicates("lsh_sig")
  }

  /** Streaming segment (paragraph) dedup — the streaming face of batch
    * D12's first-occurrence ELECTION
    * ([[graft.operators.DedupOps.segmentDedup]]): incoming docs explode into
    * their non-overlapping word segments map-side, and the first arrival of
    * each distinct segment survives; per-segment state is evicted at the
    * watermark horizon like [[dedupExactStream]]'s fingerprints. Document
    * REASSEMBLY is deliberately batch-only — in an unbounded stream any
    * future arrival can still claim a segment, so a streaming "clean_text"
    * could never be emitted finally; the surviving segment stream is the
    * useful streaming contract (append it to the corpus store, reassemble
    * in batch).
    */
  def segmentDedupStream(docs: DataFrame): DataFrame = {
    val segs = docs
      .withColumn("event_time", timestamp_millis(col("ts")))
      .select(col("doc_id"), col("event_time"),
        posexplode(graft.operators.DedupOps.segmentArray(col("text")))
          .as(Seq("seg_idx", "seg")))
      .withColumn("seg_idx", col("seg_idx").cast("long"))
      .withColumn("seg_key", md5(col("seg")))
      .withWatermark("event_time", "1 hour")
    if (segs.isStreaming) segs.dropDuplicatesWithinWatermark("seg_key")
    // batch face: dropDuplicates keeps an ARBITRARY row per key on
    // multi-partition input — elect the first occurrence through the SAME
    // helper the batch operator uses, so the contract cannot drift
    else graft.operators.DedupOps.electFirstSegment(segs, col("seg_key"))
  }

  /** Streaming audio fingerprint dedup — the streaming face of batch M8
    * ([[graft.operators.MultimodalOps.audioFingerprintDups]]): each arriving
    * blob is fingerprinted at the REAL codec seam through the SAME
    * `audioPrefixKey` the batch operator uses (encode → WavCodec decode →
    * 2-frame energy key), then first-arrival-per-key survives with
    * watermark-evicted state — [[dedupExactStream]]'s contract with the
    * fingerprint swapped from md5(text) to the decoded audio prefix. Blobs
    * shorter than the prefix pass through no row (same eligibility rule as
    * batch). State is one row per distinct LIVE fingerprint, gone at the
    * watermark horizon. The non-streaming branch keeps the MIN doc_id per
    * key — batch m8's keeper contract — rather than dropDuplicates'
    * partition-order-dependent arbitrary row.
    */
  def audioFingerprintStream(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val keyed = docs
      .filter(col("n_chars") >= graft.operators.MultimodalOps.AudioPrefixSamples)
      .select(col("doc_id"), col("n_chars"), col("ts"))
      .as[(Long, Long, Long)]
      .mapPartitions(_.map { case (id, n, ts) =>
        (id, ts, graft.operators.MultimodalOps.audioPrefixKey(id, n)) })
      .toDF("doc_id", "ts", "prefix_key")
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "1 hour")
    if (keyed.isStreaming) keyed.dropDuplicatesWithinWatermark("prefix_key")
    else
      // deterministic batch survivor: min doc_id (the m8 keeper contract) —
      // dropDuplicates keeps an ARBITRARY partition-order-dependent row, so
      // the batch face only matched the streaming first-arrival under
      // coalesce(1); min_by pins it without relying on partition order
      keyed.groupBy(col("prefix_key"))
        .agg(min_by(struct(col("doc_id"), col("ts"), col("event_time")),
          col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.ts").as("ts"),
          col("prefix_key"), col("r.event_time").as("event_time"))
  }

  /** Continuous data-quality monitoring — DQ1's streaming face: every
    * arriving micro-batch of documents gets the SAME declarative
    * check battery ([[graft.operators.RelationalOps.documentQualityChecks]],
    * shared code so the contracts cannot drift), emitted as a per-batch
    * report — the load-gating pattern (quarantine or alert when a batch's
    * `violations > 0`) that a warehouse runs at ingest, not after the bad
    * load lands. foreachBatch, zero stream state; per-batch cost is the
    * battery's own scan-aggregates over batch-sized data.
    */
  def qualityMonitorStream(docs: DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.RelationalOps.documentQualityChecks(batch), id)
    }

  /** Streaming incremental dedup — the streaming face of batch D19
    * ([[graft.operators.DedupOps.incrementalDedupOf]]): each arriving
    * micro-batch is triaged (`exact` | `near` | `novel`) against the STATIC
    * history index, the per-micro-batch `foreachBatch` shape J3b
    * established ([[WideJoins.enrichAsOf]]) — which is exactly what the
    * operator semantically is: incremental dedup IS batch-vs-index, so the
    * stream face reuses the batch operator verbatim per trigger instead of
    * re-deriving it with stream-side state. `history` is by-name, re-read
    * per batch, so an index rebuilt between triggers is picked up —
    * batch-local novelty (two near-dups arriving in the SAME batch both
    * report novel) is the documented contract, identical to
    * [[stripSpansStream]]'s vs-reference semantics.
    *
    * Scale notes: state is zero (no state store at all); per-batch cost is
    * the batch operator's own — history never shuffled, batch side
    * broadcast everywhere — so an hourly crawl drop pays exactly one
    * indexed-scan triage per trigger.
    */
  def incrementalDedupStream(incoming: DataFrame, history: => DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.DedupOps.incrementalDedupOf(batch, history), id)
    }

  /** Streaming boilerplate removal — the streaming face of
    * [[graft.operators.DedupOps.boilerplateStrip]] (d17): incoming docs are
    * cleaned against a STATIC boilerplate segment set (the indexed corpus's
    * ≥ minDf cross-document segments from
    * [[graft.operators.DedupOps.boilerplateSegments]], or any curated
    * blocklist). The set aggregates to one row and cross-broadcasts; the
    * per-row work is segment + filter inside the row projection — a
    * STATELESS streaming projection: no watermark, no state store, no
    * stream-side shuffle; identical in batch.
    *
    * A stream cannot know the future, so (like [[stripSpansStream]]) the
    * contract is vs-reference: a FRESH boilerplate pattern flooding the
    * stream dedups against the next index build. With
    * `ref = boilerplateSegments(corpus)` the batch face of this call equals
    * [[graft.operators.DedupOps.boilerplateStrip]] row-for-row on segmented
    * docs (parity-spec-pinned). The probe is `array_contains` over the
    * broadcast set — linear per segment in the set size, which is small BY
    * CONSTRUCTION (only text repeated across ≥ minDf documents survives
    * stage 1).
    */
  def boilerplateStripStream(docs: DataFrame, boilerSegs: DataFrame): DataFrame = {
    val refSet = boilerSegs.agg(collect_set("seg").as("boiler_set"))
    docs
      .withColumn("segs", graft.operators.DedupOps.segmentArray(col("text")))
      .crossJoin(broadcast(refSet))
      .withColumn("kept",
        filter(col("segs"), s => !array_contains(col("boiler_set"), s)))
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        size(col("kept")).cast("long").as("kept_segs"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  /** Streaming per-domain quota cap — the streaming face of
    * [[graft.operators.CurationOps.domainCap]]'s COUNT bound: admit at most
    * `cap` documents per source, first arrivals win (within a micro-batch,
    * (ts, doc_id) order pins ties deterministically). The batch operator
    * picks a salted-hash sample for unbiasedness; a stream cannot know the
    * future, so the streaming contract is admission control — the knob that
    * stops one domain flooding a live ingest.
    *
    * Scale notes: state is ONE long per source — bounded by domain count,
    * not corpus size — and never needs eviction; the only shuffle is the
    * groupByKey on source. Admitted rows stream out in append mode.
    */
  def domainCapStream(spark: SparkSession, docs: DataFrame, cap: Int = 15): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val ds = docs.select(col("source"), col("doc_id"), col("ts"))
      .as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, recs: Iterator[(String, Long, Long)], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = (cap - admitted).max(0L).toInt
          val keep = recs.toSeq.sortBy(r => (r._3, r._2)).take(room)
          if (keep.nonEmpty) state.update(admitted + keep.size)
          keep.iterator
      }
      .toDF("source", "doc_id", "ts")
  }

  /** Streaming conversion funnel — the streaming face of
    * [[graft.operators.StatsOps.funnel]] (a10) and the multi-stage
    * generalization of the reference's CEP family (W6's two-event pattern,
    * app/dwm/UserJumpDetailApp.java:88-90): a per-user state machine tracks
    * the first view, the first qualifying click (strictly after the view,
    * within the 24 h step window), and the first qualifying purchase,
    * emitting one append-mode transition row `(user_id, stage, us)` the
    * moment each stage first completes — the live funnel dashboard feed.
    *
    * Parity contract: under event-time-ordered arrival (the reference's
    * monotone 0 s-watermark assumption for its order stream; within a
    * micro-batch the fold sorts by (us, event order) itself), the first
    * qualifying event in ts order IS the batch operator's window minimum,
    * so stage counts aggregated from the transitions equal a10's
    * viewed/clicked/purchased exactly (parity-pinned). Cross-batch
    * stragglers older than an already-taken stage are ignored — the same
    * first-wins semantic as [[domainCapStream]].
    *
    * Scale notes: state is three optional longs per user — user-count
    * bounded, no growth with event volume; the only shuffle is the
    * groupByKey on user_id. Stage completions stream out in append mode.
    */
  def funnelStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val winUs = 24L * 3600 * 1000000
    val ds = events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, recs: Iterator[(Long, String, Long)],
            state: GroupState[(Long, Long, Long)]) =>
          // -1L = stage not reached: a real µs timestamp is never negative,
          // but it CAN be 0 (epoch) — a 0L sentinel would re-admit a stage
          // whose first event lands exactly at epoch (caught by the
          // random-split parity property)
          var (v, c, p) = state.getOption.getOrElse((-1L, -1L, -1L))
          val out = Seq.newBuilder[(Long, String, Long)]
          recs.toSeq.sortBy(_._3).foreach { case (_, tpe, us) =>
            if (tpe == "view" && v == -1L) {
              v = us; out += ((uid, "view", us))
            } else if (tpe == "click" && v != -1L && c == -1L &&
                us > v && us <= v + winUs) {
              c = us; out += ((uid, "click", us))
            } else if (tpe == "purchase" && c != -1L && p == -1L &&
                us > c && us <= c + winUs) {
              p = us; out += ((uid, "purchase", us))
            }
          }
          state.update((v, c, p))
          out.result().iterator
      }
      .toDF("user_id", "stage", "us")
  }

  /** Streaming clickstream transitions — the streaming face of
    * [[graft.operators.StatsOps.eventTransitions]] (a12): one string of
    * state per user (the last event type) turns the live event stream into
    * a stream of `(prev_type, next_type, us)` transition rows; the Markov
    * rollup is then any downstream count. Under event-time-ordered arrival
    * the emitted multiset equals the batch operator's lag() derivation
    * exactly (parity-pinned); within a micro-batch the fold sorts by
    * (us, event order) itself.
    *
    * Scale notes: state is one (type, us) pair per user; the only shuffle
    * is the user_id groupByKey. Transition rows stream out append-mode.
    */
  def transitionsStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ds = events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long), (String, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, recs: Iterator[(Long, String, Long)],
            state: GroupState[(String, Long)]) =>
          var (prev, _) = state.getOption.getOrElse(("_start", -1L))
          var lastUs = -1L
          val out = Seq.newBuilder[(String, String, Long)]
          recs.toSeq.sortBy(_._3).foreach { case (_, tpe, us) =>
            out += ((prev, tpe, us))
            prev = tpe; lastUs = us
          }
          state.update((prev, lastUs))
          out.result().iterator
      }
      .toDF("prev_type", "next_type", "us")
  }

  /** Streaming cohort retention — the streaming face of
    * [[graft.operators.StatsOps.retention]] (r3): per user, two longs of
    * state (cohort day = first-active day, last emitted day) turn the live
    * stream into append-mode `(user_id, cohort_day, day_offset)` first-
    * activity-of-day rows; `count` per (cohort_day, day_offset) is r3's
    * `active_users`. Under event-time-ordered arrival days arrive
    * non-decreasing, so the `day > last` guard is exactly the per-(user,
    * day) distinct of the batch operator (parity-pinned).
    *
    * Scale notes: state never grows with activity — two longs per user —
    * and the only shuffle is the user_id groupByKey.
    */
  def retentionStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ds = events
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, recs: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          // -1L sentinels: epoch day 0 is a legal cohort/activity day
          var (cohort, last) = state.getOption.getOrElse((-1L, -1L))
          val out = Seq.newBuilder[(Long, Long, Long)]
          recs.toSeq.sortBy(_._2).foreach { case (_, day) =>
            if (cohort == -1L) cohort = day
            if (day > last) { out += ((uid, cohort, day - cohort)); last = day }
          }
          state.update((cohort, last))
          out.result().iterator
      }
      .toDF("user_id", "cohort_day", "day_offset")
  }

  /** Streaming benchmark decontamination — the streaming face of
    * [[graft.operators.CurationOps.decontaminate]]: incoming docs are flagged
    * against a STATIC held-out benchmark table. The bench shingle set is
    * aggregated to a single set-row and cross-broadcast, so the per-doc
    * overlap count is the native count-only [[graft.functions.IntersectCount]]
    * on the doc's own (map-side) shingle array — a STATELESS streaming
    * projection: no watermark, no state store, no stream-side shuffle; works
    * identically in batch.
    *
    * Scale notes: right-sized for bench sets that fit an executor (the usual
    * case — held-out benchmarks are small by construction). If the set is too
    * large to broadcast, use the bloom route
    * ([[graft.operators.CurationOps.bloomDecontaminate]] on micro-batches via
    * foreachBatch).
    */
  def decontaminateStream(docs: DataFrame, bench: DataFrame): DataFrame = {
    val benchSet = bench
      .select(explode(array_distinct(
        graft.operators.DedupOps.shingleArray(col("text")))).as("shingle"))
      .agg(collect_set("shingle").as("bench_set"))
    docs
      .withColumn("sh", array_distinct(graft.operators.DedupOps.shingleArray(col("text"))))
      .crossJoin(broadcast(benchSet))
      .withColumn("overlap_ct",
        graft.functions.IntersectCount(col("sh"), col("bench_set")))
      .select(col("doc_id"), col("overlap_ct"), (col("overlap_ct") === 0).as("is_clean"))
  }

  /** Streaming exact-substring span removal — the streaming face of
    * [[graft.operators.DedupOps.exactSubstringSpans]]/[[graft.operators.DedupOps.stripDuplicatedSpans]]:
    * incoming docs are cleaned against a STATIC reference gram set (the
    * indexed corpus's duplicated k-grams from
    * [[graft.operators.DedupOps.duplicatedGrams]], or any curated
    * boilerplate list). The set aggregates to one row and cross-broadcasts;
    * the whole mark-merge-excise runs inside the row projection via the
    * native [[graft.functions.DupSpans]] kernel (hash the ref once per row,
    * O(1) probe per gram) plus an indexed filter over the split words
    * against the row's own few spans — a STATELESS streaming projection: no
    * watermark, no state store, no stream-side shuffle; identical in batch.
    *
    * A stream cannot know the future, so (like [[segmentDedupStream]]) the
    * streaming contract is necessarily vs-reference rather than
    * corpus-global: two never-before-seen docs that share a fresh span
    * dedup against the NEXT index build, not within the stream. With
    * `ref = duplicatedGrams(corpus)` the batch face of this call equals
    * [[graft.operators.DedupOps.stripDuplicatedSpans]] row-for-row
    * (parity-spec-pinned).
    */
  def stripSpansStream(docs: DataFrame, refGrams: DataFrame, k: Int = 8): DataFrame = {
    val refSet = refGrams.agg(collect_set("gram").as("ref_set"))
    docs
      .withColumn("grams", graft.operators.DedupOps.kgramArray(col("text"), k))
      .crossJoin(broadcast(refSet))
      .withColumn("spans",
        graft.functions.DupSpans(col("grams"), col("ref_set"), k))
      .withColumn("words", split(col("text"), " "))
      .withColumn("kept", filter(col("words"), (_, i) =>
        !exists(col("spans"), s =>
          i.cast("long") >= shiftright(s, 32) &&
          i.cast("long") <= s.bitwiseAND(lit(0xffffffffL)))))
      .select(col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        (size(col("words")) - size(col("kept"))).cast("long").as("removed_tokens"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  /** Streaming LM quality scoring — the streaming face of
    * [[graft.operators.TextOps.lmScore]] (t13): incoming docs are scored
    * against a STATIC pre-trained add-one bigram model (trained here from
    * the indexed `corpus` with the same construction as the batch
    * operator). The model aggregates to ONE row of two vocabulary-sized
    * maps (bigram→count, context→count) plus the vocab size, and
    * cross-broadcasts; each doc's whole score is computed inside the row
    * projection — a STATELESS streaming projection: no watermark, no state
    * store, no stream-side shuffle; identical in batch.
    *
    * Exact batch parity by construction: the in-row fold walks the SORTED
    * bigram array, collapses equal runs to (bigram, tf), and accumulates
    * `floor(tf·ln(P)·10⁴ + 0.5)` as an INTEGER deci-milli count — the very
    * quantity the batch face sums as DECIMAL(18,4) — so `sum_logprob`/`nll`
    * match [[graft.operators.TextOps.lmScore]] bit-for-bit (parity-pinned).
    * Bigrams unseen by the model back off to `P = 1/(ctx+V)` — exactly the
    * add-one estimate for a zero count, so live drift scores HIGH nll
    * instead of crashing the query.
    *
    * Scale notes: a bigram model is vocabulary-sized — megabytes even for a
    * 100 TB training corpus — so the broadcast is the right distribution;
    * re-train and swap the model DataFrame per index build, like
    * [[stripSpansStream]]'s reference grams.
    */
  def lmScoreStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val toks = corpus.select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val bi = toks.select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // ctx from the (w1,w2) counts, not a second pass over bi: the two model
    // tables group by DIFFERENT keys, so the corpus-scale explode ran twice
    // (no shared exchange). ctx(w1) = Σ_w2 cb(w1,w2) exactly (integer
    // sums); the checkpoint is load-bearing — the optimizer collapses
    // aggregate-over-aggregate chains back to two direct corpus passes
    // without it (r14; mirrors the batch lmScore db materialization). The
    // checkpointed frame is vocabulary²-sized, re-paid only per model
    // build, and the model swap owns its release.
    val cbCounts = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint()
    val cbm = cbCounts
      .agg(map_from_arrays(
        collect_list(concat_ws(" ", col("w1"), col("w2"))),
        collect_list(col("cb"))).as("cbmap"))
    val ctxm = cbCounts.groupBy("w1").agg(sum("cb").as("ctx"))
      .agg(map_from_arrays(collect_list(col("w1")), collect_list(col("ctx"))).as("ctxmap"))
    val vq = corpus.select(explode(split(col("text"), " ")).as("x"))
      .agg(countDistinct(col("x")).as("v"))
    val model = cbm.crossJoin(ctxm).crossJoin(vq)

    // integer deci-milli term for one collapsed (bigram, tf) run — the same
    // double pipeline as the batch operator, floored to BIGINT
    def term(bg: String, tf: String): String =
      s"""CAST(FLOOR(CAST($tf AS DOUBLE) * ln(
         |  (CAST(coalesce(element_at(cbmap, $bg), CAST(0 AS BIGINT)) AS DOUBLE) + 1.0) /
         |  CAST((coalesce(element_at(ctxmap, split($bg, ' ')[0]), CAST(0 AS BIGINT)) + v) AS DOUBLE)
         |) * 10000.0 + 0.5) AS BIGINT)""".stripMargin
    val fold =
      s"""aggregate(
         |  array_sort(transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))),
         |  named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), 'acc', CAST(0 AS BIGINT)),
         |  (a, x) -> IF(x <=> a.prev,
         |    named_struct('prev', a.prev, 'run', a.run + CAST(1 AS BIGINT), 'acc', a.acc),
         |    named_struct('prev', x, 'run', CAST(1 AS BIGINT),
         |      'acc', a.acc + IF(a.prev IS NULL, CAST(0 AS BIGINT), ${term("a.prev", "a.run")}))),
         |  a -> a.acc + IF(a.prev IS NULL, CAST(0 AS BIGINT), ${term("a.prev", "a.run")}))""".stripMargin
    docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 2)
      .crossJoin(broadcast(model))
      .withColumn("acc", expr(fold))
      .select(col("doc_id"),
        (size(col("w")) - 1).cast("long").as("n_bigrams"),
        (col("acc").cast("double") / 10000.0).as("sum_logprob"))
      .withColumn("nll",
        floor(col("sum_logprob") * -10000.0 / col("n_bigrams") + 0.5) / 10000.0)
  }

  /** Streaming DSIR scoring — the streaming face of
    * [[graft.operators.CurationOps.dsirWeights]] (s10): incoming docs get
    * importance weights against a STATIC hashed-bigram model pair trained
    * from the indexed `corpus` (target = t2's quality gate, raw = all).
    * The model is 1024 buckets — it aggregates to ONE row of two
    * bucket→count maps plus the two totals and cross-broadcasts, and each
    * doc's weight is an in-row fold: STATELESS — no watermark, no state
    * store, no stream-side shuffle; identical in batch.
    *
    * Exact batch parity by construction (the [[lmScoreStream]] discipline):
    * the fold walks the SORTED bucket array, collapses equal runs to
    * (bucket, tf), and accumulates
    * `floor(tf·ln p̂_t·10⁴ + 0.5) − floor(tf·ln p̂_r·10⁴ + 0.5)` as an
    * INTEGER deci-milli count — exactly the two DECIMAL(18,4) leaf terms
    * the batch face sums — so weight/gscore match bit-for-bit
    * (parity-pinned). Buckets the model never saw back off to the add-one
    * zero-count estimate on both models, so live drift scores low instead
    * of crashing the query.
    */
  def dsirScoreStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val w0 = split(col("text"), " ")
    val isTarget = (when(size(w0).cast("long") >= 20, 1).otherwise(0) +
      when(size(filter(w0, x => x === "the" || x === "a")) > 0, 1).otherwise(0) +
      when(col("n_chars") >= 100, 1).otherwise(0)) >= 2
    val bi = corpus.select(w0.as("w"), isTarget.as("is_target"))
      .filter(size(col("w")) >= 2)
      .select(col("is_target"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")).as("bg"))
      .select(col("is_target"),
        (conv(substring(md5(concat(lit("dsir:"), col("bg"))), 1, 4), 16, 10)
          .cast("long") % 1024).as("bucket"))
    val perBucket = bi.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val model = perBucket.agg(
      map_from_arrays(collect_list(col("bucket")), collect_list(col("ct"))).as("ctmap"),
      map_from_arrays(collect_list(col("bucket")), collect_list(col("cr"))).as("crmap"),
      sum("cr").as("nr"), sum("ct").as("nt"))
    def term(b: String, tf: String, cmap: String, tot: String): String =
      s"""CAST(FLOOR(CAST($tf AS DOUBLE) * ln(
         |  (CAST(coalesce(element_at($cmap, $b), CAST(0 AS BIGINT)) AS DOUBLE) + 1.0) /
         |  (CAST($tot AS DOUBLE) + 1024.0)) * 10000.0 + 0.5) AS BIGINT)""".stripMargin
    def terms(b: String, tf: String): String =
      s"""(${term(b, tf, "ctmap", "nt")} - ${term(b, tf, "crmap", "nr")})"""
    val fold =
      s"""aggregate(
         |  array_sort(transform(sequence(1, size(w) - 1),
         |    i -> CAST(conv(substring(md5(concat('dsir:', w[i-1], ' ', w[i])), 1, 4), 16, 10) AS BIGINT) % 1024)),
         |  named_struct('prev', CAST(NULL AS BIGINT), 'run', CAST(0 AS BIGINT), 'acc', CAST(0 AS BIGINT)),
         |  (a, x) -> IF(x <=> a.prev,
         |    named_struct('prev', a.prev, 'run', a.run + CAST(1 AS BIGINT), 'acc', a.acc),
         |    named_struct('prev', x, 'run', CAST(1 AS BIGINT),
         |      'acc', a.acc + IF(a.prev IS NULL, CAST(0 AS BIGINT), ${terms("a.prev", "a.run")}))),
         |  a -> a.acc + IF(a.prev IS NULL, CAST(0 AS BIGINT), ${terms("a.prev", "a.run")}))""".stripMargin
    docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 2)
      .crossJoin(broadcast(model))
      .withColumn("acc", expr(fold))
      .select(col("doc_id"),
        (size(col("w")) - 1).cast("long").as("n_feats"),
        (col("acc").cast("double") / 10000.0).as("weight"))
      .withColumn("gumbel",
        floor(-log(-log((conv(substring(md5(concat(lit("gum:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
          .cast("double") + 0.5) / 65536.0)) * 10000.0 + 0.5) / 10000.0)
      .withColumn("gscore", col("weight") + col("gumbel"))
  }

  /** Streaming perplexity bucketing — the streaming face of
    * [[graft.operators.TextOps.pplBuckets]] (t14): incoming docs are scored
    * with [[lmScoreStream]]'s broadcast bigram model and cut against STATIC
    * head/middle/tail thresholds derived from the indexed corpus's own
    * 4-dp-quantized nll histogram — the batch operator's exact threshold
    * construction, aggregated to one broadcast row. A stream cannot know
    * its own future score distribution, so the streaming contract is
    * vs-reference (the CCNet production shape: thresholds come from the
    * reference corpus snapshot, live docs classify against them); re-train
    * and swap per index build like the other model faces. Everything after
    * the model broadcasts is a per-row projection — no state store, no
    * stream-side shuffle.
    *
    * With `corpus` = the indexed corpus, the batch face of this call equals
    * [[graft.operators.TextOps.pplBuckets]] row-for-row (parity-pinned):
    * the nll values ride [[lmScoreStream]]'s bit-exact integer fold and
    * the thresholds are the same histogram cut.
    */
  def pplBucketsStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = graft.operators.TextOps.lmScore(corpus)
      .groupBy(col("nll")).agg(count(lit(1)).as("ct"))
    val all = Window.orderBy(col("nll"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum(col("ct")).over(Window.orderBy(col("nll"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("ct")).over(all))
    val th = cum.agg(
      min(when(col("cum") * 3 >= col("n"), col("nll"))).as("t1"),
      min(when(col("cum") * 3 >= col("n") * 2, col("nll"))).as("t2"))
    lmScoreStream(docs, corpus)
      .select(col("doc_id"), col("nll"))
      .crossJoin(broadcast(th))
      .select(col("doc_id"), col("nll"),
        when(col("nll") <= col("t1"), "head")
          .when(col("nll") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Streaming NB quality classification — the streaming face of
    * [[graft.operators.TextOps.nbQualityScore]] (t15): incoming docs are
    * scored against a STATIC pre-trained Naive-Bayes model (trained here
    * from the indexed `corpus` with the same construction as the batch
    * operator). The model aggregates to one row of two vocabulary-sized
    * maps (word→pos count, word→neg count) plus token totals and vocab
    * size; class doc-counts ride a second one-row broadcast; each doc's
    * whole log-odds is computed inside the row projection — a STATELESS
    * streaming projection, the [[lmScoreStream]] recipe.
    *
    * Exact batch parity by construction: the in-row fold walks the SORTED
    * word array, collapses equal runs to (word, tf), and accumulates
    * `floor(tf·ln(P)·10⁴ + 0.5)` per class as INTEGER deci-milli counts —
    * the very quantities the batch face sums as DECIMAL(18,4) — plus the
    * identically-quantized prior, so `log_odds`/`predicted` match
    * bit-for-bit (parity-pinned). Model-unseen words back off to the
    * add-one zero-count estimate for BOTH classes, so live vocabulary
    * drift shifts scores smoothly instead of crashing the query.
    *
    * Scale notes: an NB unigram model is vocabulary-sized — megabytes for
    * any corpus — so the broadcast is the right distribution; re-train and
    * swap the model per index build, like [[stripSpansStream]]'s grams.
    */
  def nbScoreStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val w0 = split(col("text"), " ")
    val isPos = (when(size(w0).cast("long") >= 20, 1).otherwise(0) +
      when(size(filter(w0, x => x === "the" || x === "a")) > 0, 1).otherwise(0) +
      when(col("n_chars") >= 100, 1).otherwise(0)) >= 2
    val tf = corpus.select(isPos.as("is_pos"), explode(w0).as("word"))
      .filter(col("word").isNotNull)
    val perWord = tf.groupBy("word").agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(!col("is_pos"), 1L).otherwise(0L)).as("cn"))
    val maps = perWord.agg(
      map_from_arrays(collect_list(col("word")), collect_list(col("cp"))).as("cpmap"),
      map_from_arrays(collect_list(col("word")), collect_list(col("cn"))).as("cnmap"),
      sum("cp").as("tp"), sum("cn").as("tn"), count(lit(1)).as("v"))
    val docsCt = corpus.agg(
      sum(when(isPos, 1L).otherwise(0L)).as("np"),
      sum(when(!isPos, 1L).otherwise(0L)).as("nn"))
    def term(wrd: String, tfE: String, cmap: String, tot: String): String =
      s"""CAST(FLOOR(CAST($tfE AS DOUBLE) * ln(
         |  (CAST(coalesce(element_at($cmap, $wrd), CAST(0 AS BIGINT)) AS DOUBLE) + 1.0) /
         |  (CAST($tot AS DOUBLE) + CAST(v AS DOUBLE))) * 10000.0 + 0.5) AS BIGINT)""".stripMargin
    def terms(wrd: String, tfE: String): String =
      s"""(${term(wrd, tfE, "cpmap", "tp")} - ${term(wrd, tfE, "cnmap", "tn")})"""
    val fold =
      s"""aggregate(
         |  array_sort(w),
         |  named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), 'acc', CAST(0 AS BIGINT)),
         |  (a, x) -> IF(x <=> a.prev,
         |    named_struct('prev', a.prev, 'run', a.run + CAST(1 AS BIGINT), 'acc', a.acc),
         |    named_struct('prev', x, 'run', CAST(1 AS BIGINT),
         |      'acc', a.acc + IF(a.prev IS NULL, CAST(0 AS BIGINT), ${terms("a.prev", "a.run")}))),
         |  a -> a.acc + IF(a.prev IS NULL, CAST(0 AS BIGINT), ${terms("a.prev", "a.run")}))""".stripMargin
    docs
      .withColumn("w", split(col("text"), " "))
      .crossJoin(broadcast(maps))
      .crossJoin(broadcast(docsCt))
      .withColumn("acc", expr(fold))
      .withColumn("prior_dm", expr(
        "CAST(FLOOR(ln(CAST(np AS DOUBLE) / CAST(nn AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        ((col("prior_dm") + col("acc")).cast("double") / 10000.0).as("log_odds"))
      .withColumn("predicted",
        when(col("log_odds") > 0, "keep").otherwise("drop"))
  }

  /** Continuous column profiling — DQ3's streaming face, qualityMonitorStream's
    * sibling: every arriving micro-batch gets the SAME per-column profile
    * battery ([[graft.operators.RelationalOps.columnProfile]], shared code so
    * the report schema cannot drift) — the per-load catalog stats a warehouse
    * records next to each ingest (null spikes and distinct-count collapses
    * surface at load time, feeding the dq2 drift alarm). foreachBatch, zero
    * stream state; per-batch cost is the battery's own pruned scans over
    * batch-sized data.
    */
  def profileMonitorStream(docs: DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.RelationalOps.columnProfile(batch), id)
    }

  /** Continuous freshness monitoring — DQ5's streaming face, and the one
    * member of the dq family that is INHERENTLY continuous (a staleness
    * dashboard refreshed per ingest, not per audit). Per micro-batch the
    * sink receives the full [[graft.operators.RelationalOps.freshness]]
    * report over EVERYTHING seen so far, computed from compacted state
    * that stays exact by construction: the reference point is the running
    * global max timestamp, which only ADVANCES, so any event older than
    * ref − 24h can never re-enter the last-day window — such rows fold
    * irreversibly into two per-stream scalars (total count, last-seen) and
    * only the trailing-day rows are retained raw. A stream that stops
    * sending keeps appearing in every report (its lag growing) — exactly
    * the alert dq5 exists for; an outer join over the scalar state makes
    * silence visible instead of dropping the row.
    *
    * Scale notes (100 TB): state = one trailing day of (stream, ts) pairs
    * (16 bytes/event — the day's ingest, the natural state floor for an
    * exact 24h-window count) + streams×2 scalars; each batch pays one
    * union + filter + two stream-keyed aggregations of batch∪state, all
    * map-side-combinable. Parity is spec-pinned: the final report equals
    * the batch operator over the union of all arrived events, bit-exact.
    */
  def freshnessStream(events: DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var recent: Option[DataFrame] = None // (event_type, us), us > ref − 24h
    var older: Option[DataFrame] = None  // (event_type, old_total, old_last)
    val dayUs = 86400000000L
    events.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.select(col("event_type"), unix_micros(col("ts")).as("us"))
        val live = recent.map(_.unionByName(b)).getOrElse(b)
        val refRow = live.agg(max(col("us")).as("ref_us"))
        val withRef = live.crossJoin(broadcast(refRow))
        val keep = withRef.filter(col("us") > col("ref_us") - dayUs)
          .select("event_type", "us").localCheckpoint(true)
        val aged = withRef.filter(col("us") <= col("ref_us") - dayUs)
          .groupBy("event_type")
          .agg(count(lit(1)).as("old_total"), max(col("us")).as("old_last"))
        val mergedOld = older.map(_.unionByName(aged).groupBy("event_type")
            .agg(sum(col("old_total")).as("old_total"),
              max(col("old_last")).as("old_last")))
          .getOrElse(aged).localCheckpoint(true)
        recent.foreach(graft.operators.DedupOps.unpersistCheckpoint)
        older.foreach(graft.operators.DedupOps.unpersistCheckpoint)
        recent = Some(keep)
        older = Some(mergedOld)
        val fresh = keep.groupBy("event_type")
          .agg(max(col("us")).as("r_last"), count(lit(1)).as("r_ct"))
        val report = fresh.join(mergedOld, Seq("event_type"), "full_outer")
          .crossJoin(broadcast(keep.agg(max(col("us")).as("ref_us"))))
          .select(col("event_type"),
            greatest(col("r_last"), col("old_last")).as("last_us"),
            (col("ref_us") - greatest(col("r_last"), col("old_last")))
              .as("lag_us"),
            (coalesce(col("r_ct"), lit(0L)) +
              coalesce(col("old_total"), lit(0L))).as("total_events"),
            coalesce(col("r_ct"), lit(0L)).as("events_last_day"))
        sink(report, id)
    }
  }

  /** Continuous distribution monitoring over CONSTANT sketch state — the
    * streaming face of the KLL quantile sketch, completing the sketch
    * family's deployment story (HLL counts distincts, count-min counts
    * frequencies, KLL tracks the distribution): each micro-batch is
    * sketched DISTRIBUTED (the kll_sketch aggregator — raw rows never
    * reach the driver), merged into the running sketch (a few KB,
    * regardless of stream length), and the sink receives the tracked
    * quantiles plus the EXACT total count (weight-preserving compaction
    * recovers N exactly even though values are approximate). This is the
    * length-distribution drift monitor that pairs with dq2/dq3: a median
    * that walks or a p99 that collapses at ingest time is a upstream
    * change caught before it poisons training mixes.
    *
    * Error contract: quantile VALUES carry the sketch's rank error (~1.5%
    * empirical at K=200, 3% spec bound — KllQuantileSpec); `n` is exact.
    */
  def quantileMonitorStream(docs: DataFrame, valueCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.9))(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var sketch: Array[Array[Double]] = graft.functions.Kll.empty
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.agg(graft.functions.KllFunctions
            .kll_sketch(col(valueCol).cast("double")).as("sk"))
          .head.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("sk")
        sketch = graft.functions.Kll.merge(sketch, b.map(_.toArray).toArray)
        val spark = batch.sparkSession
        import spark.implicits._
        val n = graft.functions.Kll.totalWeight(sketch)
        sink(qs.map(q =>
          (q, graft.functions.Kll.quantile(sketch, q), n)).toDF("q", "value", "n"),
          id)
    }
  }

  /** Continuous referential-integrity monitoring — DQ7's streaming face,
    * and the member of the dq family that is MOST naturally per-load: each
    * arriving micro-batch of fact rows is audited against the dimension
    * (orphan/NULL-key counts via the SAME
    * [[graft.operators.RelationalOps.fkCheck]] the batch battery runs, so
    * the report schema and semantics cannot drift) — the ingest gate that
    * catches an out-of-order load BEFORE downstream joins silently drop
    * rows. `dim` is by-name, re-read per batch (the d19 / J3b static-index
    * shape), so a dimension refreshed between triggers is picked up.
    * Zero stream state; per-batch cost is one keyed (or broadcast) left
    * join of batch-sized rows.
    */
  def fkMonitorStream(facts: DataFrame, fk: String, dim: => DataFrame,
      pk: String, rel: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    facts.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.RelationalOps.fkCheck(rel, batch, fk, dim, pk),
          id)
    }

  /** Continuous marketing attribution — A14's streaming face, completing
    * the analytics family's continuous story (funnel/transitions/retention
    * already stream): per micro-batch the sink receives the COMPLETE
    * refreshed per-channel report (first/last/linear/U-shape), equal to the
    * batch operator over every event seen so far. Upsert semantics like
    * entityResolveStream: a late view inside a live purchase's lookback
    * legitimately REVISES that purchase's touch count and weights, so the
    * report rewrites rather than appends.
    *
    * Exact compacted state under the in-horizon arrival contract (events
    * arrive within one 24h lookback of the running max — the same
    * watermark-shaped promise every stateful face here makes): the
    * reference only ADVANCES, so a purchase older than ref − 24h can gain
    * no further in-horizon views — its attribution is frozen and folds
    * irreversibly into per-channel DECIMAL accumulators (decimal partials
    * are order-free and partition-associative, so done ⊕ live equals the
    * one-shot batch sum bit-for-bit; see
    * [[graft.operators.StatsOps.attributionPartials]]). A view retires at
    * TWO windows (it can only touch purchases up to one window after it,
    * which finalize at most one window after that). State is therefore two
    * trailing windows of projected events plus channels×6 scalars.
    *
    * Scale notes (100 TB): each batch pays the batch operator's own
    * user-keyed candidate join over WINDOW-BOUNDED rows (two days of
    * events, not history), one channel-sized state merge, and the p_id
    * windows the batch plan already shares. Nothing corpus-scale persists.
    */
  def attributionStream(events: DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val winUs = graft.operators.StatsOps.AttribWinUs
    var live: Option[DataFrame] = None    // projected events, two windows
    var doneAgg: Option[DataFrame] = None // per-channel decimal partials
    events.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = graft.operators.StatsOps.attributionPre(batch)
        val all = live.map(_.unionByName(b)).getOrElse(b)
        val refRow = all.agg(max(col("us")).as("ref_us"))
        val withRef = all.crossJoin(broadcast(refRow))
        // frozen purchases: their whole lookback is still retained (views
        // live two windows), so attribution computes complete, ONCE
        val finalizing = withRef
          .filter(col("event_type") === "purchase" &&
            col("us") < col("ref_us") - winUs)
          .drop("ref_us")
        val frozen = graft.operators.StatsOps.attributionPartials(
          graft.operators.StatsOps.attributionMarkedPre(
            finalizing.unionByName(
              all.filter(col("event_type") === "view"))))
        val mergedDone = doneAgg.map(_.unionByName(frozen))
          .getOrElse(frozen)
          .groupBy("channel").agg(
            sum(col("ft_purchases")).as("ft_purchases"),
            sum(col("ft_rev_d")).as("ft_rev_d"),
            sum(col("lt_purchases")).as("lt_purchases"),
            sum(col("lt_rev_d")).as("lt_rev_d"),
            sum(col("lin_rev_d")).as("lin_rev_d"),
            sum(col("pos_rev_d")).as("pos_rev_d"))
          .localCheckpoint(true)
        val keep = withRef.filter(
            (col("event_type") === "purchase" &&
              col("us") >= col("ref_us") - winUs) ||
            (col("event_type") === "view" &&
              col("us") > col("ref_us") - 2 * winUs))
          .drop("ref_us").localCheckpoint(true)
        live.foreach(graft.operators.DedupOps.unpersistCheckpoint)
        doneAgg.foreach(graft.operators.DedupOps.unpersistCheckpoint)
        live = Some(keep)
        doneAgg = Some(mergedDone)
        val report = graft.operators.StatsOps.attributionFinish(
          mergedDone.unionByName(graft.operators.StatsOps.attributionPartials(
            graft.operators.StatsOps.attributionMarkedPre(keep))))
        sink(report, id)
    }
  }

  /** Continuous volume-anomaly detection — DQ6's streaming face, dq5's
    * alerting sibling: per micro-batch the sink receives the full z-score
    * battery ([[graft.operators.RelationalOps.volumeAnomalyOfDaily]], the
    * SAME finisher as batch dq6 so the report schema and arithmetic cannot
    * drift) over everything seen so far. The state is the (stream, day)
    * count frame itself — per-day counts are SUFFICIENT STATISTICS for the
    * whole battery, so folding each batch's micro-counts into the running
    * frame loses nothing: parity with the batch operator over the union of
    * all arrived events is exact (spec-pinned), unlike a windowed
    * approximation.
    *
    * Scale notes (100 TB): state is streams × days rows of integers —
    * bounded by the key domain, not the corpus; each batch pays one
    * map-side-combinable (stream, day) count of ITS OWN rows plus a merge
    * with the tiny state frame, and the finisher's windows all share the
    * one stream-keyed exchange of that frame (the batch plan's own shape).
    */
  def volumeAnomalyStream(events: DataFrame, zGate: Double = 2.0)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var daily: Option[DataFrame] = None // (event_type, day_idx, ct)
    events.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = graft.operators.RelationalOps.dailyCounts(batch)
        val merged = daily.map(_.unionByName(b)
            .groupBy("event_type", "day_idx").agg(sum(col("ct")).as("ct")))
          .getOrElse(b).localCheckpoint(true)
        daily.foreach(graft.operators.DedupOps.unpersistCheckpoint)
        daily = Some(merged)
        sink(graft.operators.RelationalOps.volumeAnomalyOfDaily(merged, zGate),
          id)
    }
  }

  /** Streaming entity resolution — the incremental face of batch E2
    * ([[graft.operators.TextOps.entityResolve]]), completing the one
    * operator family that had no streaming form. The d19 shape at the
    * record-linkage seam: each arriving micro-batch of (p_partkey, p_name)
    * records is blocked ONLY for its genuinely-new names (bigram postings +
    * the short-name length-window fallback, both BROADCAST as the probe
    * side) against the accumulated name vocabulary, verified with the exact
    * codegen `levenshtein`, and the verified pairs merged into the running
    * pair graph; components recluster and the sink receives the COMPLETE
    * refreshed canonical map (p_name, canonical_name) each batch — upsert
    * semantics like the K3 dim sink, because a late bridge name ("red bolt"
    * arriving after "red belt" and "red bolt" founded separate entities)
    * legitimately REWRITES earlier assignments; an append contract would
    * have to lie about transitivity.
    *
    * Parity (pinned in StatefulParitySpec): after the last batch, the map
    * applied to all arrived records equals batch `entityResolve` on the
    * same records — including clusters STRADDLING micro-batches and a
    * later batch LOWERING a name's founding id (state keys pairs by NAME,
    * not id, precisely so a smaller record id can arrive without orphaning
    * the name's edges; ids re-derive from the vocabulary every batch).
    *
    * Scale notes (100 TB): per-batch cost is batch-bounded — candidate
    * generation broadcasts the NEW names' grams (batch-sized) against the
    * vocabulary gram stream (vocab-sized, ≪ records, never shuffled by
    * corpus size); the component loop is d10's machinery over pair-touched
    * vertices only. State = vocabulary + verified name-pair set, both
    * vocabulary-bounded, held as eager localCheckpoints with the d10
    * retire-on-supersede block lifecycle — nothing grows with record
    * count.
    */
  def entityResolveStream(parts: DataFrame, maxDist: Int = 2)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var vocab: Option[DataFrame] = None   // (name, id = min record key seen)
    var pairsByName: Option[DataFrame] = None // (name_a < name_b) verified
    def gramsOf(df: DataFrame): DataFrame =
      df.select(col("name"), explode(array_distinct(
        expr("transform(sequence(1, length(name) - 1), i -> substring(name, i, 2))")))
        .as("g"))
    parts.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val bNames = batch.groupBy(col("p_name").as("name"))
          .agg(min(col("p_partkey")).as("id"))
        val merged = vocab.map(_.unionByName(bNames)
            .groupBy("name").agg(min(col("id")).as("id")))
          .getOrElse(bNames).localCheckpoint(true)
        // block only names never seen before: an existing name's edges are
        // already in the pair state (keyed by name, so id changes are inert)
        val fresh = vocab.map(v => bNames.join(v.select("name"), Seq("name"), "left_anti"))
          .getOrElse(bNames)
        val shortLen = 2 * maxDist + 2
        def shortsOf(df: DataFrame) =
          df.select(col("name"), length(col("name")).as("len"))
            .filter(col("len") < shortLen)
        val candG = gramsOf(merged)
          .join(broadcast(gramsOf(fresh).withColumnRenamed("name", "bname")), Seq("g"))
        val candS = shortsOf(merged)
          .join(broadcast(shortsOf(fresh)
              .select(col("name").as("bname"), col("len").as("blen"))),
            abs(col("len") - col("blen")) <= maxDist)
        val cand = candG.select("name", "bname")
          .unionByName(candS.select("name", "bname"))
          .filter(col("name") =!= col("bname"))
          .select(least(col("name"), col("bname")).as("name_a"),
            greatest(col("name"), col("bname")).as("name_b"))
          .distinct()
        val newPairs = cand
          .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
        val allPairs = pairsByName.map(_.unionByName(newPairs).distinct())
          .getOrElse(newPairs).localCheckpoint(true)
        val idOf = (side: String) => merged
          .select(col("name").as(s"name_$side"), col("id").as(s"doc_$side"))
        val clusters = graft.operators.DedupOps.connectedComponents(
          merged.select(col("id").as("doc_id")),
          allPairs.join(idOf("a"), Seq("name_a")).join(idOf("b"), Seq("name_b"))
            .select("doc_a", "doc_b"))
        val canonMap = clusters
          .join(merged.select(col("id").as("cluster_id"),
            col("name").as("canonical_name")), Seq("cluster_id"))
          .join(merged.select(col("id").as("doc_id"), col("name")), Seq("doc_id"))
          .select(col("name").as("p_name"), col("canonical_name"))
        sink(canonMap, id)
        // retire the superseded snapshots only AFTER the sink consumed the
        // new map (the d10 deterministic block lifecycle)
        vocab.foreach(graft.operators.DedupOps.unpersistCheckpoint)
        pairsByName.foreach(graft.operators.DedupOps.unpersistCheckpoint)
        vocab = Some(merged)
        pairsByName = Some(allPairs)
    }
  }

  /** Continuous vector search — the ANN family's streaming face: STANDING
    * queries (`query_id`, `qe` — the registered-alert / recommendation-feed
    * shape) watch a corpus of vectors ARRIVING as a stream, and each
    * micro-batch refreshes every updated query's running exact top-k. The
    * arriving vectors are scored through the SAME
    * [[graft.operators.AnnOps.scoredPairs]] projection n1's search runs
    * (broadcast queries, map-side 4-dp cosine — contracts cannot drift),
    * then each query's state-store list absorbs its batch candidates:
    * top-k is merge-associative (top-k(A ∪ B) = top-k(top-k(A) ∪
    * top-k(B))) and every vector arrives once, so after any arrival split
    * the report equals the one-shot batch search bit-for-bit — ordering
    * ties and all (sim desc, neighbor asc, the n1 contract; sims are 4-dp
    * quantized upstream so every compare here is on exact doubles).
    *
    * This is the PRODUCTION state shape (round-12/13 verdicts' ask): a
    * `flatMapGroupsWithState` fold keyed by query — k scalars per query in
    * the executor state store, checkpoint-recoverable, scaling with query
    * count across the cluster. Nothing is collected to the driver and no
    * driver-held map exists. Each trigger emits the updated queries' full
    * current top-k (update mode); in the standing-query shape every
    * non-degenerate batch updates every query, so each emission is the
    * whole report.
    *
    * Scale notes (100 TB): per batch the corpus-side work is one map-side
    * scoring pass over BATCH-sized rows (no corpus shuffle, queries
    * broadcast); the one keyed exchange moves batch-candidate rows to
    * their query's state partition; the in-task fold keeps O(k) memory
    * regardless of batch size. An unbounded stream holds queries × k
    * scalars of state total.
    */
  def vectorSearchKeyedStream(vectors: DataFrame, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val sims = graft.operators.AnnOps.scoredPairs(vectors, queries)
      .as[(Long, Long, Double)]
    sims.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Double, Long)], (Long, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (qid: Long, recs: Iterator[(Long, Long, Double)],
            state: GroupState[List[(Double, Long)]]) =>
          // (−sim, neighbor_id) ascending = sim desc, id asc — n1's order
          val ord = Ordering.by[(Double, Long), (Double, Long)] {
            case (sim, nid) => (-sim, nid)
          }
          var best = state.getOption.getOrElse(Nil)
          // O(k) per record: the k-bounded insert keeps group memory
          // constant no matter how many candidates one trigger delivers
          recs.foreach { case (_, nid, sim) =>
            best = ((sim, nid) :: best).sorted(ord).take(k)
          }
          state.update(best)
          best.iterator.zipWithIndex.map { case ((sim, nid), i) =>
            (qid, nid, (i + 1).toLong, sim)
          }
      }
      .toDF("query_id", "neighbor_id", "rnk", "sim")
  }

  /** The sink-callback face over [[vectorSearchKeyedStream]] — kept for
    * callers that want the per-trigger report as a plain DataFrame. The
    * callback receives exactly the keyed stream's update-mode emission
    * (state lives in the store, not here).
    */
  def vectorSearchStream(vectors: DataFrame, queries: DataFrame, k: Int = 5)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectorSearchKeyedStream(vectors, queries, k)
      .writeStream.outputMode("update").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          sink(batch, id)
      }

  /** A4/X1 — KeywordStats streaming: tokenize (whitespace UDTF replacement,
    * app/function/SplitFunction.java:12-28) + 10s window count.
    * Input columns: full_word string, ts (millis).
    */
  def keywordStats(searches: DataFrame): DataFrame =
    searches
      .withColumn("rt", timestamp_millis(col("ts")))
      .withWatermark("rt", "1 second")
      .select(col("rt"), explode(split(col("full_word"), "\\s+")).as("keyword"))
      .filter(length(col("keyword")) > 0)
      .groupBy(window(col("rt"), "10 seconds"), col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .select(col("keyword"), col("ct"), lit("search").as("source"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"))
}
