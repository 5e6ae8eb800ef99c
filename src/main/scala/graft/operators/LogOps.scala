package graft.operators

import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavior-log operators (SURVEY §2.3/§2.5/§2.6), re-expressed over the
  * driver's `events` table. Each is a pure batch DataFrame function; the
  * streaming twins live in [[graft.streaming]].
  *
  * Scale notes: all per-key state (dedup, first-seen, jump detection) is
  * expressed as window functions / aggregations over the key — these shuffle
  * once on the key and never collect to the driver, so they partition cleanly
  * across a 1000-executor cluster. No UDFs: everything stays inside
  * whole-stage codegen.
  */
object LogOps {

  /** P1+P7 — JSON parse with dirty-record channel + map element access.
    * Reference: try/catch parse with OutputTag (app/dwd/BaseLogApp.java:49-67)
    * and `page['item']` map access (app/dws/KeywordStatsApp.java:71-79).
    * Spark: `from_json` is null on corrupt input → null flag replaces the
    * side output; map access via MapType parse.
    */
  def jsonParse(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("prop_k"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
          .getItem("k").cast("int").as("prop_k_map"))
      .withColumn("is_dirty", col("prop_k").isNull)
      .filter(!col("is_dirty"))
      .drop("is_dirty")
  }

  /** S2+F9+P3 — CDC envelope normalization + delete filter.
    * Reference: `create`→`insert` normalization (app/function/CustomerDeserialization.java:74-79)
    * and delete-filter at source (app/dwd/BaseDBApp.java:49-58).
    * events.event_type models the binlog op: signup→create, click→update,
    * error→delete, rest→read; `create` is rewritten to `insert`, deletes dropped.
    */
  def cdcNormalize(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val rawOp = when(col("event_type") === "signup", "create")
      .when(col("event_type") === "click", "update")
      .when(col("event_type") === "error", "delete")
      .otherwise("insert")
    ev.select(col("event_id"), lit("events").as("table_name"), rawOp.as("raw_op"))
      .withColumn("op", when(col("raw_op") === "create", "insert").otherwise(col("raw_op")))
      .filter(col("op") =!= "delete")
      .select("event_id", "table_name", "op")
  }

  /** P4 — 3-way log split (app/dwd/BaseLogApp.java:106-147): route each record
    * to the start / page / display branch. One source → labeled branches; in
    * streaming this fans out to three sinks (see [[graft.streaming.LogPipeline]]).
    */
  def logSplit(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.select(col("event_id"), col("event_type"),
      when(col("event_type") === "signup", "start")
        .when(col("event_type") === "view", "display")
        .otherwise("page").as("branch"))
  }

  /** A5 — keyed dedup: first visit per (user, day)
    * (app/dwm/UniqueVisitApp.java:54-102, 24h TTL ValueState). Batch form:
    * rank within the key and keep the first; the shuffle key (user_id, day)
    * is exactly the reference's keyed-state key + TTL horizon.
    */
  def uniqueVisit(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"), col("visit_date"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("visit_date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "visit_date", "event_id")
  }

  /** A6 — new/old visitor correction (app/dwd/BaseLogApp.java:69-102):
    * `is_new` stays 1 only for the first-ever record of the key.
    */
  def newVisitorFix(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .select(col("event_id"), col("user_id"),
        when(col("rn") === 1, 1).otherwise(0).as("is_new"))
  }

  /** W6 — user-jump (bounce) detection (app/dwm/UserJumpDetailApp.java:81-120):
    * CEP pattern "entry page followed by nothing within 10s" — batch analog via
    * `lead`: a record is a bounce when the same user's next event is absent or
    * more than 10 minutes later. The streaming twin with true timeout emission
    * is [[graft.streaming.UserJump]] (flatMapGroupsWithState + event-time timeout).
    */
  def userJump(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNull ||
        unix_micros(col("next_ts")) - unix_micros(col("ts")) > 600L * 1000000L)
      .select(col("event_id"), col("user_id"))
  }
}
