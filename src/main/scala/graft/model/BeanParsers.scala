package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P2 — parse-to-bean maps (app/dwm/OrderWideApp.java:50-91,
  * app/dwm/PaymentWideApp.java:47-81): JSON lines → typed Datasets with the
  * reference's derived columns (`create_date`, `create_hour`, `create_ts`
  * split out of `create_time yyyy-MM-dd HH:mm:ss`).
  *
  * Everything is `from_json` + codegen'd column expressions; the typed
  * Dataset is produced once at the end, so Catalyst prunes and pushes through
  * the parse. Money fields parse as DECIMAL(16,2) (the reference's
  * BigDecimal columns, bean/OrderInfo.java:13-17).
  */
object BeanParsers {
  private val money = DecimalType(16, 2)

  private val orderInfoSchema = StructType(Seq(
    StructField("id", LongType), StructField("province_id", LongType),
    StructField("order_status", StringType), StructField("user_id", LongType),
    StructField("total_amount", money),
    StructField("activity_reduce_amount", money),
    StructField("coupon_reduce_amount", money),
    StructField("original_total_amount", money),
    StructField("feight_fee", money),
    StructField("expire_time", StringType), StructField("create_time", StringType),
    StructField("operate_time", StringType)))

  /** order_info JSON lines (col `value`) → Dataset[OrderInfo] with derived
    * create_date/create_hour (split, OrderWideApp.java:55-58) and epoch-ms
    * create_ts (OrderWideApp.java:60-63).
    */
  def orderInfo(spark: SparkSession, raw: DataFrame): Dataset[OrderInfo] = {
    import spark.implicits._
    raw.select(from_json(col("value"), orderInfoSchema).as("j"))
      .filter(col("j").isNotNull && col("j.id").isNotNull)
      .select("j.*")
      .withColumn("create_date", substring(col("create_time"), 1, 10))
      .withColumn("create_hour", substring(col("create_time"), 12, 2))
      .withColumn("create_ts", unix_millis(to_timestamp(col("create_time"))))
      .na.fill("", Seq("expire_time", "operate_time", "order_status"))
      .as[OrderInfo]
  }

  private val orderDetailSchema = StructType(Seq(
    StructField("id", LongType), StructField("order_id", LongType),
    StructField("sku_id", LongType), StructField("order_price", money),
    StructField("sku_num", LongType), StructField("sku_name", StringType),
    StructField("create_time", StringType),
    StructField("split_total_amount", money),
    StructField("split_activity_amount", money),
    StructField("split_coupon_amount", money)))

  /** order_detail JSON lines → Dataset[OrderDetail] (PaymentWideApp-style
    * create_ts derivation).
    */
  def orderDetail(spark: SparkSession, raw: DataFrame): Dataset[OrderDetail] = {
    import spark.implicits._
    raw.select(from_json(col("value"), orderDetailSchema).as("j"))
      .filter(col("j").isNotNull && col("j.id").isNotNull)
      .select("j.*")
      .withColumn("create_ts", unix_millis(to_timestamp(col("create_time"))))
      .na.fill("", Seq("sku_name"))
      .as[OrderDetail]
  }
}
