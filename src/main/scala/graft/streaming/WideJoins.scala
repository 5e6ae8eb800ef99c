package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** DWM wide-table joins (SURVEY §2.4), Structured Streaming form.
  *
  * Scale notes: each stream-stream join carries the equi-key (order id), so
  * Spark plans a state-store hash join partitioned by key; the time-range
  * bound + watermarks let the state store evict rows past the horizon — state
  * is O(traffic within the interval), not O(stream). Dim enrichment is a
  * broadcast join against dim snapshots (the reference's async Phoenix/Redis
  * machinery, app/function/DimAsyncFunction.java:17-71, collapses away;
  * divergence: dims are read at micro-batch time, not per-record lookup time
  * — SURVEY §7.4.5).
  */
object WideJoins {

  /** J1 — OrderWide interval join (app/dwm/OrderWideApp.java:94-105):
    * order_info ⋈ order_detail on id = order_id within ±5s event time.
    * Inputs must carry epoch-millis `create_ts`; watermarks are monotonic (0s)
    * like the reference's forMonotonousTimestamps (:65-91).
    */
  def orderWide(orderInfo: DataFrame, orderDetail: DataFrame): DataFrame = {
    val oi = orderInfo
      .withColumn("oi_time", timestamp_millis(col("create_ts")))
      .withWatermark("oi_time", "0 seconds")
    val od = orderDetail
      .withColumnRenamed("id", "detail_id")
      .withColumnRenamed("create_ts", "od_create_ts")
      .withColumn("od_time", timestamp_millis(col("od_create_ts")))
      .withWatermark("od_time", "0 seconds")
    oi.join(od,
      oi("id") === od("order_id") &&
        od("od_time") >= oi("oi_time") - expr("INTERVAL 5 SECONDS") &&
        od("od_time") <= oi("oi_time") + expr("INTERVAL 5 SECONDS"))
  }

  /** J2 — PaymentWide interval join (app/dwm/PaymentWideApp.java:85-94):
    * payment_info ⋈ order_wide on order_id, order events within
    * [payment − 15 min, payment + 5 min] of the payment's callback time.
    *
    * Contract: `paymentInfo` has `id, order_id, callback_ts` (millis);
    * `orderWide` has `order_id, create_ts` (millis). The order side's
    * `create_time` is surfaced as `order_create_time`
    * (bean/PaymentWide.java:82) and its other columns pass through.
    */
  def paymentWide(paymentInfo: DataFrame, orderWide: DataFrame): DataFrame = {
    val pay = paymentInfo
      .withColumnRenamed("id", "payment_id")
      .withColumn("pay_time", timestamp_millis(col("callback_ts")))
      .withWatermark("pay_time", "0 seconds")
    val owRenamed = (if (orderWide.columns.contains("create_time"))
        orderWide.withColumnRenamed("create_time", "order_create_time")
      else orderWide)
      .withColumnRenamed("order_id", "ow_order_id")
    val ow = owRenamed
      .withColumn("ow_time", timestamp_millis(col("create_ts")))
      .withWatermark("ow_time", "0 seconds")
    pay.join(ow,
        pay("order_id") === ow("ow_order_id") &&
          ow("ow_time") >= pay("pay_time") - expr("INTERVAL 15 MINUTES") &&
          ow("ow_time") <= pay("pay_time") + expr("INTERVAL 5 MINUTES"))
      .drop("ow_order_id")
  }

  /** J3 — dimension enrichment: broadcast joins against small dim snapshots.
    * `dims` maps a join-key column on the fact side to the dim DataFrame
    * (keyed `id`); applied left-outer so facts without a dim row survive,
    * matching the reference's join-then-mutate semantics.
    */
  def enrich(fact: DataFrame, dims: Seq[(String, DataFrame, String)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (factKey, dim, prefix)) =>
      val renamed = dim.columns.foldLeft(dim)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
      acc.join(broadcast(renamed), acc(factKey) === renamed(s"${prefix}id"), "left")
    }

  /** J3b — EXACT lookup-time dim resolution in STREAMING: each micro-batch
    * of facts resolves against a versioned SCD2 `history` table through the
    * NATIVE as-of join ([[graft.plans.AsOfJoinNative]]), so every fact gets
    * the dim version in force at its own EVENT time — the semantics the
    * reference approximates with per-record Phoenix lookups at processing
    * time (app/function/DimAsyncFunction.java:17-71) and the snapshot
    * broadcast join (above) approximates with "latest at batch time".
    *
    * Why `foreachBatch` and not a streaming join: the as-of operator is a
    * whole-operator batch SparkPlan; inside foreachBatch each micro-batch
    * is a plain batch frame, so the exact operator applies unchanged — and
    * the history side is re-read per batch, picking up dim updates between
    * batches like the reference's cache-aside reads. Scale: the per-batch
    * cost is the operator's own O(|batch| + |history touched|) merge; both
    * sides shuffle once on the key per batch, and a bucketed history table
    * (Bucketing.scala) removes even that on the history side.
    *
    * Returns the configured writer so the caller picks trigger/checkpoint;
    * `sink` receives each resolved micro-batch with the batch id.
    */
  def enrichAsOf(facts: DataFrame, history: => DataFrame, key: String,
      factTs: String, histTs: String, prefix: String = "r_")(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    facts.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        sink(graft.plans.AsOfJoinNative.asOf(
          batch, history, key, factTs, histTs, prefix), id)
      }
}
