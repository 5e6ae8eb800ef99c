package graft.model

import org.apache.spark.sql.types._

/** Typed record shapes mirroring the reference's Lombok beans and the Kafka
  * topic contracts (SURVEY §1.2, FIXTURES.md). Money columns are
  * DecimalType(16,2) (reference uses BigDecimal, bean/OrderInfo.java:13-17);
  * timestamps stay epoch-millis longs plus formatted strings exactly like the
  * reference's `create_time yyyy-MM-dd HH:mm:ss` + `create_ts` pairs.
  */
object Schemas {

  /** Behavior-log event (Kafka ods_base_log; FIXTURES §1, fields read at
    * app/dwd/BaseLogApp.java:52-143).
    */
  val logEvent: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("mid", StringType), StructField("uid", StringType),
      StructField("vc", StringType), StructField("ch", StringType),
      StructField("ar", StringType), StructField("is_new", StringType),
      StructField("ba", StringType), StructField("md", StringType),
      StructField("os", StringType)))),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType), StructField("last_page_id", StringType),
      StructField("item", StringType), StructField("item_type", StringType),
      StructField("during_time", LongType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("display_type", StringType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("order", IntegerType),
      StructField("pos_id", IntegerType))))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType), StructField("open_ad_id", IntegerType),
      StructField("loading_time", LongType)))),
    StructField("ts", LongType)))

  /** CDC envelope (Kafka ods_base_db; app/function/CustomerDeserialization.java:30-90).
    * before/after stay as raw JSON strings — table-specific schemas are applied
    * downstream by the router, mirroring the reference's dynamic JSONObject use.
    */
  val cdcEnvelope: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("tableName", StringType),
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("type", StringType),
    // binlog position / source timestamp (Debezium ts_ms, Maxwell ts) —
    // defines source order for last-write-wins dim upserts; envelopes
    // without it sort first (seq 0, i.e. snapshot phase). Parsed as STRING:
    // a LongType field would make PERMISSIVE-mode from_json null out the
    // WHOLE struct on a non-numeric ts from a foreign producer, silently
    // dropping the envelope at decodeEnvelope's isNotNull filter — the
    // string survives and is cast (null on garbage → seq 0) downstream.
    StructField("ts", StringType)))

  /** Routing config row (table_process, bean/TableProcess.java:14-26). */
  val tableProcess: StructType = StructType(Seq(
    StructField("sourceTable", StringType),
    StructField("operateType", StringType),
    StructField("sinkType", StringType),
    StructField("sinkTable", StringType),
    StructField("sinkColumns", StringType),
    StructField("sinkPk", StringType),
    StructField("sinkExtend", StringType)))
}

/** bean/OrderInfo.java:9-23 (derived create_date/create_hour/create_ts
  * computed in app/dwm/OrderWideApp.java:50-73).
  */
case class OrderInfo(
    id: Long, province_id: Long, order_status: String, user_id: Long,
    total_amount: BigDecimal, activity_reduce_amount: BigDecimal,
    coupon_reduce_amount: BigDecimal, original_total_amount: BigDecimal,
    feight_fee: BigDecimal, expire_time: String, create_time: String,
    operate_time: String, create_date: String, create_hour: String,
    create_ts: Long)

/** bean/OrderDetail.java:9-19. */
case class OrderDetail(
    id: Long, order_id: Long, sku_id: Long, order_price: BigDecimal,
    sku_num: Long, sku_name: String, create_time: String,
    split_total_amount: BigDecimal, split_activity_amount: BigDecimal,
    split_coupon_amount: BigDecimal, create_ts: Long)

/** bean/PaymentInfo.java:10-17. */
case class PaymentInfo(
    id: Long, order_id: Long, user_id: Long, total_amount: BigDecimal,
    subject: String, payment_type: String, create_time: String,
    callback_time: String)

/** bean/VisitorStats.java:11-23 — DWS visitor row. */
case class VisitorStats(
    stt: String, edt: String, vc: String, ch: String, ar: String,
    is_new: String, uv_ct: Long, pv_ct: Long, sv_ct: Long, uj_ct: Long,
    dur_sum: Long, ts: Long)

/** bean/KeywordStats.java:11-16. */
case class KeywordStats(
    keyword: String, ct: Long, source: String, stt: String, edt: String, ts: Long)
