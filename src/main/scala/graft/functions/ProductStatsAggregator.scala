package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One input event for the product-stats rollup (a normalized union row,
  * SURVEY §2.3 P9).
  */
case class ProductEvent(event_type: String, event_id: Long, amount_cents: Long)

/** Mutable-free aggregation buffer: counters + three EXACT distinct id sets —
  * the reference's hand-rolled UDAF-in-a-ReduceFunction
  * (app/dws/ProductStatsApp.java:253-301; HashSet buffers
  * bean/ProductStats.java:77-87).
  */
case class ProductBuf(
    click_ct: Long, display_ct: Long, paid_ct: Long, refund_ct: Long,
    amount_cents: Long,
    orderIds: Set[Long], paidIds: Set[Long], refundIds: Set[Long])

/** Finished row: exact distinct counts materialized (finisher at
  * ProductStatsApp.java:294-296 — `order_ct = set.size`).
  */
case class ProductOut(
    click_ct: Long, display_ct: Long, paid_ct: Long, refund_ct: Long,
    order_amount: Double, order_ct: Long, paid_order_ct: Long, refund_order_ct: Long)

/** X2/A2 — typed Aggregator computing all product counters AND three exact
  * per-key distinct-id counts in ONE aggregation pass.
  *
  * Why not countDistinct: Catalyst plans n distinct aggregates as an Expand
  * (n+1 row copies) + two shuffles; this Aggregator keeps the reference's
  * single-pass reduce semantics — partial buffers merge associatively
  * (set union), so map-side partial aggregation still applies and the shuffle
  * carries one buffer per (key, partition), not expanded rows.
  *
  * Money is accumulated in exact integer cents (the reference's BigDecimal,
  * bean/OrderInfo.java:13-17) and surfaced as double once at finish.
  *
  * 100 TB caveat, documented: per-key set size is bounded by per-key distinct
  * ids in the window — the same bound the reference's HashSet state carries;
  * for unbounded keys switch to approx_count_distinct or a sketch buffer.
  */
object ProductStatsAggregator extends Aggregator[ProductEvent, ProductBuf, ProductOut] {
  override def zero: ProductBuf =
    ProductBuf(0L, 0L, 0L, 0L, 0L, Set.empty, Set.empty, Set.empty)

  override def reduce(b: ProductBuf, e: ProductEvent): ProductBuf = e.event_type match {
    case "click" => b.copy(click_ct = b.click_ct + 1)
    case "display" => b.copy(display_ct = b.display_ct + 1)
    case "order" => b.copy(amount_cents = b.amount_cents + e.amount_cents,
      orderIds = b.orderIds + e.event_id)
    case "payment" => b.copy(paid_ct = b.paid_ct + 1, paidIds = b.paidIds + e.event_id)
    case "refund" => b.copy(refund_ct = b.refund_ct + 1, refundIds = b.refundIds + e.event_id)
    case _ => b
  }

  override def merge(a: ProductBuf, b: ProductBuf): ProductBuf =
    ProductBuf(a.click_ct + b.click_ct, a.display_ct + b.display_ct,
      a.paid_ct + b.paid_ct, a.refund_ct + b.refund_ct,
      a.amount_cents + b.amount_cents,
      a.orderIds ++ b.orderIds, a.paidIds ++ b.paidIds, a.refundIds ++ b.refundIds)

  override def finish(b: ProductBuf): ProductOut =
    ProductOut(b.click_ct, b.display_ct, b.paid_ct, b.refund_ct,
      b.amount_cents / 100.0, b.orderIds.size.toLong,
      b.paidIds.size.toLong, b.refundIds.size.toLong)

  override def bufferEncoder: Encoder[ProductBuf] = Encoders.product[ProductBuf]
  override def outputEncoder: Encoder[ProductOut] = Encoders.product[ProductOut]
}
