package graft

class GraftExtensionsSpec extends SparkSpec {

  test("dot_product_f callable from SQL after registration (extension surface)") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head.getDouble(0)
    assert(r === 11.0)
  }

  test("ads catalog registration exposes stats tables to spark.sql (K6)") {
    import spark.implicits._
    val stats = Seq(("2024-01-01 00:00:00", 10.0), ("2024-01-01 10:00:00", 5.0))
      .toDF("stt", "order_amount")
    ads.Publisher.registerStats(spark, Map("product_stats" -> stats))
    val gmv = spark.sql(
      "SELECT sum(order_amount) FROM product_stats WHERE date_format(to_timestamp(stt), 'yyyyMMdd') = '20240101'")
      .head.getDouble(0)
    assert(gmv === 15.0)
  }
}
