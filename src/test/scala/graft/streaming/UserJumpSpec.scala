package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** W6 jump detection: pure decision logic + end-to-end streaming behavior
  * (match emission AND timeout emission, the reference's two outputs at
  * app/dwm/UserJumpDetailApp.java:81-120).
  */
class UserJumpSpec extends SparkSpec {

  private def entry(mid: String, page: String, ts: Long) = PageEvent(mid, page, "", ts)
  private def page(mid: String, page: String, last: String, ts: Long) =
    PageEvent(mid, page, last, ts)

  test("decide: entry followed by entry within 10s = bounce (CEP match)") {
    val buf = Seq(entry("m1", "home", 1000L), entry("m1", "home", 5000L))
    val (bounces, _) = UserJump.decide(buf, watermarkMs = 20000L)
    // first entry bounced; second entry also times out (nothing followed it)
    assert(bounces.map(_.ts) === Seq(1000L, 5000L))
  }

  test("decide: entry followed by normal navigation within 10s = no bounce") {
    val buf = Seq(entry("m1", "home", 1000L), page("m1", "detail", "home", 4000L))
    val (bounces, _) = UserJump.decide(buf, watermarkMs = 20000L)
    assert(bounces.isEmpty)
  }

  test("decide: entry with nothing after within 10s = bounce (CEP timeout)") {
    val buf = Seq(entry("m1", "home", 1000L), page("m1", "detail", "home", 15000L))
    val (bounces, _) = UserJump.decide(buf, watermarkMs = 20000L)
    assert(bounces.map(_.ts) === Seq(1000L))
  }

  test("decide: undecided entries stay pending until watermark passes horizon") {
    val buf = Seq(entry("m1", "home", 1000L))
    val (bounces, pending) = UserJump.decide(buf, watermarkMs = 5000L)
    assert(bounces.isEmpty && pending.map(_.ts) === Seq(1000L))
  }

  test("streaming: match and timeout both emit through FMGWS") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PageEvent]
    val out = UserJump.detect(spark, input.toDF())
    val q = out.writeStream.format("memory").queryName("jumps")
      .outputMode("append").start()
    try {
      // m1: entry→entry (match); m2: entry→page (no bounce); m3: entry alone (timeout)
      input.addData(
        entry("m1", "home", 1000L), entry("m1", "home", 3000L),
        page("m2", "detail", "home", 4000L), entry("m2", "home", 2000L),
        entry("m3", "home", 1000L))
      q.processAllAvailable()
      // advance watermark far past every horizon
      input.addData(page("mX", "p", "q", 100000L))
      q.processAllAvailable()
      input.addData(page("mX", "p", "q", 200000L))
      q.processAllAvailable()
      val got = spark.table("jumps").as[PageEvent].collect()
        .map(e => (e.mid, e.ts)).toSet
      assert(got.contains(("m1", 1000L)), s"match case missing: $got")   // entry→entry
      assert(got.contains(("m3", 1000L)), s"timeout case missing: $got") // entry alone
      assert(!got.contains(("m2", 2000L)), s"false bounce for m2: $got") // navigated
    } finally q.stop()
  }
}
