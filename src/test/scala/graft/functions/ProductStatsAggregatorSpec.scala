package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductStatsAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("one-pass aggregator matches multi-countDistinct results (A2/X2)") {
    val events = Seq(
      ("u1", ProductEvent("click", 1, 0)),
      ("u1", ProductEvent("order", 2, 1050)),
      ("u1", ProductEvent("order", 2, 1050)),   // same order id twice → distinct 1
      ("u1", ProductEvent("order", 3, 500)),
      ("u1", ProductEvent("payment", 2, 0)),
      ("u1", ProductEvent("refund", 3, 0)),
      ("u2", ProductEvent("display", 9, 0)))
    val ds = events.toDS()
    val got = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(ProductStatsAggregator.toColumn.name("stats"))
      .collect().toMap
    val u1 = got("u1")
    assert(u1.click_ct === 1 && u1.order_ct === 2 && u1.paid_order_ct === 1)
    assert(u1.refund_order_ct === 1 && u1.order_amount === 26.0)
    val u2 = got("u2")
    assert(u2.display_ct === 1 && u2.order_ct === 0 && u2.order_amount === 0.0)

    // cross-check against the expand-based countDistinct plan
    val df = ds.map { case (k, e) => (k, e.event_type, e.event_id, e.amount_cents) }
      .toDF("k", "event_type", "event_id", "amount_cents")
    val ref = df.groupBy("k").agg(
      countDistinct(when(col("event_type") === "order", col("event_id"))).as("order_ct"),
      sum(when(col("event_type") === "order", col("amount_cents"))).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), Option(r.get(2)).map(_.toString.toLong).getOrElse(0L))).toMap
    assert(ref("u1")._1 === u1.order_ct)
    assert(ref("u1")._2 === 2600L)
  }

  test("merge is associative and commutative on partial buffers") {
    val a = ProductStatsAggregator.reduce(ProductStatsAggregator.zero, ProductEvent("order", 1, 100))
    val b = ProductStatsAggregator.reduce(ProductStatsAggregator.zero, ProductEvent("order", 2, 200))
    val c = ProductStatsAggregator.reduce(ProductStatsAggregator.zero, ProductEvent("order", 1, 100))
    val ab_c = ProductStatsAggregator.merge(ProductStatsAggregator.merge(a, b), c)
    val a_bc = ProductStatsAggregator.merge(a, ProductStatsAggregator.merge(b, c))
    assert(ab_c === a_bc)
    assert(ProductStatsAggregator.finish(ab_c).order_ct === 2)
  }
}
