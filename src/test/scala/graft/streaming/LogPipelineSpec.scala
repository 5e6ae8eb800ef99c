package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val startLine =
    """{"common":{"mid":"m1","is_new":"1","vc":"v1","ch":"app","ar":"110000"},
      |"start":{"entry":"icon","open_ad_id":1,"loading_time":2000},"ts":1000}""".stripMargin.replace("\n", "")
  private val pageLine =
    """{"common":{"mid":"m1","is_new":"1","vc":"v1","ch":"app","ar":"110000"},
      |"page":{"page_id":"good_detail","last_page_id":"search","item":"10","item_type":"sku_id","during_time":5000},
      |"displays":[{"display_type":"query","item":"3","item_type":"sku_id","order":1,"pos_id":2},
      |{"display_type":"promo","item":"7","item_type":"sku_id","order":2,"pos_id":3}],"ts":2000}""".stripMargin.replace("\n", "")
  private val dirtyLine = "not json at all {{{"

  test("parse splits clean from dirty (P1 side-output semantics)") {
    val raw = Seq(startLine, pageLine, dirtyLine).toDF("value")
    val (clean, dirty) = LogPipeline.parse(raw)
    assert(clean.count() === 2)
    assert(dirty.count() === 1)
    assert(dirty.head.getString(0) === dirtyLine)
  }

  test("split routes start/page and explodes displays with page_id (P4)") {
    val (clean, _) = LogPipeline.parse(Seq(startLine, pageLine).toDF("value"))
    val (start, page, display) = LogPipeline.split(clean)
    assert(start.count() === 1)
    assert(page.count() === 1)
    val d = display.collect()
    assert(d.length === 2)
    assert(display.select("page_id").distinct().head.getString(0) === "good_detail")
    assert(display.select("item").as[String].collect().toSet === Set("3", "7"))
  }

  test("fixIsNew rewrites repeat visitors (A6)") {
    val lines = Seq(
      """{"common":{"mid":"m1","is_new":"1"},"ts":1000}""",
      """{"common":{"mid":"m1","is_new":"1"},"ts":2000}""",
      """{"common":{"mid":"m1","is_new":"1"},"ts":3000}""",
      """{"common":{"mid":"m2","is_new":"0"},"ts":1500}""").toDF("value")
    val (clean, _) = LogPipeline.parse(lines)
    val fixed = LogPipeline.fixIsNew(spark, clean).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fixed === Set(
      ("m1", "1", 1000L), ("m1", "0", 2000L), ("m1", "0", 3000L),
      ("m2", "0", 1500L)))
  }

  test("uniqueVisit keeps one entry page per (mid, day) (A5)") {
    val pages = Seq(
      ("m1", "home", "", 1000L),
      ("m1", "home", "", 7200000L),          // same day, second entry → dropped
      ("m1", "detail", "home", 2000L),       // not an entry page → filtered
      ("m1", "home", "", 90000000L),         // next day → kept
      ("m2", "home", null.asInstanceOf[String], 5000L))
      .toDF("mid", "page_id", "last_page_id", "ts")
    val uv = LogPipeline.uniqueVisit(pages)
    assert(uv.count() === 3)
    assert(uv.groupBy("mid", "visit_date").count().filter(col("count") > 1).count() === 0)
  }
}
