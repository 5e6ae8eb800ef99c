package graft.model

import graft.SparkSpec

class BeanParsersSpec extends SparkSpec {
  import spark.implicits._

  test("order_info JSON parses to typed bean with derived date columns (P2)") {
    val raw = Seq(
      """{"id":7,"province_id":3,"order_status":"1001","user_id":42,
        |"total_amount":99.50,"activity_reduce_amount":0.00,"coupon_reduce_amount":0.00,
        |"original_total_amount":99.50,"feight_fee":5.00,
        |"create_time":"2024-03-05 17:42:09"}""".stripMargin.replace("\n", ""),
      "not json").toDF("value")
    val ds = BeanParsers.orderInfo(spark, raw)
    val rows = ds.collect()
    assert(rows.length === 1)
    val oi = rows.head
    assert(oi.id === 7L && oi.user_id === 42L)
    assert(oi.create_date === "2024-03-05")
    assert(oi.create_hour === "17")
    assert(oi.create_ts === 1709660529000L) // 2024-03-05T17:42:09Z in millis
    assert(oi.total_amount === BigDecimal("99.50"))
  }

  test("order_detail JSON parses to typed bean (P2)") {
    val raw = Seq(
      """{"id":70,"order_id":7,"sku_id":10,"order_price":9.95,"sku_num":2,
        |"sku_name":"widget","create_time":"2024-03-05 17:42:10",
        |"split_total_amount":19.90,"split_activity_amount":0,"split_coupon_amount":0}"""
        .stripMargin.replace("\n", "")).toDF("value")
    val od = BeanParsers.orderDetail(spark, raw).head()
    assert(od.order_id === 7L && od.sku_num === 2L)
    assert(od.create_ts === 1709660530000L)
    assert(od.split_total_amount === BigDecimal("19.90"))
  }
}
