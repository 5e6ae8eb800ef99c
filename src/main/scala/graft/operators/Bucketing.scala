package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Z-ORDER key: bit-interleave two non-negative integer columns
    * (clamped to `bits` bits each) into one Morton code — the
    * multi-dimensional clustering key behind data-skipping layouts
    * (Morton 1966; the technique Delta's OPTIMIZE ZORDER and Iceberg's
    * sort orders apply). Rows range-sorted by the z-key keep BOTH columns
    * locally clustered, so per-file min/max statistics prune scans
    * filtered on EITHER dimension — unlike a lexicographic sort, which
    * clusters only its leading column.
    *
    * Pure integer bit arithmetic (32 shift-mask-shift terms), identical
    * in any engine — no hashing, no floats. Clamping (not masking) keeps
    * out-of-domain values order-preserving at the boundary instead of
    * wrapping them into the middle of the curve.
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    val xc = least(greatest(x, lit(0L)), lit((1L << bits) - 1))
    val yc = least(greatest(y, lit(0L)), lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xc, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(yc, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** L1 — z-order layout keys for the event stream: (user_id, props.k)
    * interleaved, plus the 1024-way range bucket (`zkey >> 22`) a
    * repartitionByRange layout would split files on. The query face is
    * the key computation (oracle-exact); [[zorderWrite]] applies it.
    *
    * Scale notes (100 TB): the key is a map-side projection — layout cost
    * is the one range-exchange of the WRITE, paid once, after which every
    * query filtering on user ranges OR property ranges skips files by
    * footer stats; `BucketingSpec` pins the locality win (z-bucket
    * bounding boxes are strictly tighter than arrival-order buckets).
    */
  def zorderEvents(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .withColumn("zkey", zorderKey(col("user_id"), col("k")))
      .withColumn("zbucket", shiftright(col("zkey"), 22))
  def zorderEvents(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    zorderEvents(graft.Tables.table(spark, dir, "events"))

  /** Write `df` z-order-clustered on (x, y): range-partition then sort by
    * the Morton key so file k holds one compact curve segment — both
    * dimensions' min/max footers stay tight.
    */
  def zorderWrite(df: DataFrame, x: String, y: String, path: String,
      files: Int = 32): Unit = {
    val keyed = df.withColumn("_z", zorderKey(col(x), col(y)))
    keyed.repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** L4 — data-SKIPPING effectiveness audit, the number that justifies l1:
    * for the same box predicate (`user_id ≤ uHi AND k ≤ kHi`), how many
    * files must a scan touch under the ARRIVAL layout (event_id-contiguous
    * 1024-row files — what a stream sink writes) versus the Z-ORDER layout
    * (fixed zkey ranges — what [[zorderWrite]] produces)? Emits one row per
    * layout: files_total, files_touched (file [min,max] boxes overlapping
    * the predicate), rows_read (read amplification), rows_matched — the
    * before/after table every OPTIMIZE ZORDER decision is argued from.
    * Everything is integer arithmetic over deterministic file assignments,
    * so the oracle states the identical layout.
    *
    * Scale notes (100 TB): per-file min/max/count is ONE keyed aggregation
    * with map-side partials (at scale it reads footer STATS, not rows —
    * this query derives the same numbers from rows to stay oracle-exact);
    * the verdict rollup runs over file-count-sized frames. No global sort:
    * arrival files come from dense ids, z-files from fixed key ranges —
    * both pure projections.
    */
  def skippingStats(events: DataFrame, uHi: Long = 31L,
      kHi: Long = 31L): DataFrame = {
    // spread first: the JSON parse + curve keys + layout explode + partial
    // agg otherwise all run inside the scan stage, which a single-row-group
    // input serializes onto one task (r14); on well-split inputs spread is
    // a pass-through
    val base = zorderEvents(graft.Tables.spread(events))
    val matched = col("user_id") <= uHi && col("k") <= kHi
    val perFile = base
      .select(col("user_id"), col("k"),
        explode(map(
          lit("arrival"), expr("event_id div 1024"),
          lit("zorder"), shiftright(col("zkey"), 12))).as(Seq("layout", "file_id")))
      .groupBy("layout", "file_id")
      .agg(count(lit(1)).as("rows"),
        min(col("user_id")).as("u_min"), min(col("k")).as("k_min"),
        sum(when(matched, 1L).otherwise(0L)).as("m"))
    // box overlap: predicate floor is 0 and file minima are >= 0, so a file
    // is touched iff BOTH minima sit at or below the predicate ceiling
    val touched = col("u_min") <= uHi && col("k_min") <= kHi
    perFile.groupBy("layout").agg(
      count(lit(1)).as("files_total"),
      sum(when(touched, 1L).otherwise(0L)).as("files_touched"),
      sum(when(touched, col("rows")).otherwise(0L)).as("rows_read"),
      sum(col("m")).as("rows_matched"))
  }
  def skippingStats(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    skippingStats(graft.Tables.table(spark, dir, "events"))

  /** L5 — THREE-way layout bake-off: l4's skipping audit extended with the
    * HILBERT layout ([[graft.functions.HilbertIndex]]), the locality-better
    * space-filling curve (every curve step moves ONE grid cell, so equal
    * curve segments have tighter bounding boxes than Morton's
    * diagonal-jumping Z — the reason Delta's OPTIMIZE grew a HILBERT mode).
    * Same box predicate, same file granularity (4096-key curve segments),
    * same per-layout verdict columns — the table that decides WHICH curve
    * to cluster on, not just whether to cluster.
    *
    * Scale notes (100 TB): both curve keys are scan-side codegen'd integer
    * projections (zero joins); the audit is ONE keyed aggregation with
    * map-side partials over (layout, file_id) — 3× l4's rollup rows, still
    * file-catalog-sized. The oracle states the Hilbert rotation rounds as
    * chained CTEs over the same integers, so the layouts are bit-identical
    * across engines.
    */
  def layoutCompare(events: DataFrame, uHi: Long = 31L,
      kHi: Long = 31L): DataFrame = {
    // spread first — same single-task scan-stage rationale as skippingStats
    val base = zorderEvents(graft.Tables.spread(events))
      .withColumn("hkey",
        graft.functions.HilbertIndex.hilbert_key(col("user_id"), col("k")))
    val matched = col("user_id") <= uHi && col("k") <= kHi
    val perFile = base
      .select(col("user_id"), col("k"),
        explode(map(
          lit("arrival"), expr("event_id div 1024"),
          lit("zorder"), shiftright(col("zkey"), 12),
          lit("hilbert"), shiftright(col("hkey"), 12))).as(Seq("layout", "file_id")))
      .groupBy("layout", "file_id")
      .agg(count(lit(1)).as("rows"),
        min(col("user_id")).as("u_min"), min(col("k")).as("k_min"),
        sum(when(matched, 1L).otherwise(0L)).as("m"))
    val touched = col("u_min") <= uHi && col("k_min") <= kHi
    perFile.groupBy("layout").agg(
      count(lit(1)).as("files_total"),
      sum(when(touched, 1L).otherwise(0L)).as("files_touched"),
      sum(when(touched, col("rows")).otherwise(0L)).as("rows_read"),
      sum(col("m")).as("rows_matched"))
  }
  def layoutCompare(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    layoutCompare(graft.Tables.table(spark, dir, "events"))

  /** L2 — compaction planning, l1's sibling for the OTHER lakehouse layout
    * chore (the small-files problem): assign each document to an output
    * file of ≈ `targetBytes`, bin-packed in id order WITHIN a
    * (lang, shard) slice — `file_idx = floor(bytes_before_me / target)`,
    * the first-fit-in-order plan every compaction job (Delta OPTIMIZE,
    * Iceberg rewriteDataFiles) computes before it moves a byte. Shard =
    * `doc_id % numShards` keeps the running sum DETERMINISTIC and
    * engine-portable (no hash seams) while bounding every window
    * partition.
    *
    * Scale notes (100 TB): the only structure is one running-sum window
    * per (lang, shard) — parallelism = shards × langs, each partition
    * sorts only its own slice (never a global sort), and the output is a
    * pure projection the actual rewrite job consumes as its partition
    * spec. Skew-bounded by construction: a shard's byte volume is ~1/N of
    * its language.
    */
  def compactionPlan(docs: DataFrame, targetBytes: Long = 16384L,
      numShards: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("shard", col("doc_id") % numShards)
      .withColumn("cum_bytes", sum(col("n_chars")).over(w))
      .withColumn("file_idx",
        floor((col("cum_bytes") - col("n_chars")) / targetBytes.toDouble).cast("long"))
      .select("doc_id", "lang", "shard", "file_idx", "cum_bytes")
  }
  def compactionPlan(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    compactionPlan(graft.Tables.table(spark, dir, "documents"))
}
