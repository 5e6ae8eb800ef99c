package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout helpers — the co-located join path (SURVEY §4 /
  * the 100 TB playbook's "pre-partition what you join repeatedly").
  *
  * A fact table joined against the same key family every run (orders ⋈
  * customer, events ⋈ users) pays a full shuffle of both sides per query.
  * Writing both sides bucketed AND sorted by the join key pins rows to
  * hash-stable files at WRITE time: every later join on that key plans as a
  * zero-Exchange sort-merge join — each task zips bucket i of both tables
  * straight off storage. At 100 TB that converts the recurring dominant
  * shuffle into a one-time write cost, and bucket pruning serves point
  * lookups from a single file per side.
  *
  * The reference's analog is Phoenix salting/pre-split regions for its dim
  * tables (app/function/TableProcessFunction.java:70-127 creates dim tables
  * keyed on id) — here the layout is declared once on the lake instead.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed and sorted by `key` —
    * `buckets` must match across tables meant to join shuffle-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. The plan contract
    * (zero Exchange operators) is pinned by `BucketingSpec`.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
