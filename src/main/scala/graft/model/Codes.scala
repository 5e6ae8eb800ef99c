package graft.model

/** F12 — the reference's code tables (common/GmallConstant.java:5-67), the
  * dictionary constants DWS queries filter on (e.g. APPRAISE_GOOD at
  * app/dws/ProductStatsApp.java:215-219).
  */
object Codes {
  // order status
  val OrderUnpaid = "1001"
  val OrderPaid = "1002"
  val OrderCancel = "1003"
  val OrderFinish = "1004"
  val OrderRefund = "1005"
  val OrderRefundDone = "1006"
  // payment status
  val PaymentSuccess = "1602"
  val PaymentFail = "1603"
  // appraise codes
  val AppraiseGood = "1201"
  val AppraiseSoso = "1202"
  val AppraiseBad = "1203"
  val AppraiseAuto = "1204"
  // refund reasons
  val RefundReasonBadGoods = "1301"
  val RefundReasonWrongDesc = "1302"
  val RefundReasonSales = "1303"
  val RefundReasonSizeIssue = "1304"
  val RefundReasonMissingPage = "1305"
  val RefundReasonNoReason = "1306"
  val RefundReasonOther = "1307"
}
