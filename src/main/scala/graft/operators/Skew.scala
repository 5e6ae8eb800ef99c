package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at 100 TB (SURVEY §4 / build-prompt scale
  * checklist). AQE's skew-join handling covers joins at runtime; these helpers
  * cover the aggregation side, where one hot key (a viral sku, a bot mid)
  * would otherwise serialize into a single reducer.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) computes partials on
    * `saltBuckets` reducers per key, then a second groupBy (key) merges them.
    * Correct for any algebraic aggregate supplied as (partial, merge) pairs —
    * the caller gives partial aggregates keyed by output name and a merge
    * expression over the partial column.
    *
    * Example — skew-safe count + sum:
    * {{{
    * Skew.saltedAgg(df, col("sku_id"), 16,
    *   Seq(count(lit(1)).as("ct"), sum(col("amount")).as("amt")),
    *   Seq(sum(col("ct")).as("ct"), sum(col("amt")).as("amt")))
    * }}}
    */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("_salt", rowSalt(df, saltBuckets))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("_key"))
      .agg(merges.head, merges.tail: _*)

  /** Deterministic per-row salt: a hash of the row's columns mod buckets. A
    * partition-id/monotonic-id salt changes if a map task is recomputed after
    * some reducers already fetched its output (the SPARK-23207 shuffle-replay
    * class of bug), double-counting or dropping rows from the merged
    * aggregate; a row-content hash reassigns recomputed rows identically.
    * Identical rows sharing a bucket is fine — the salt only needs to spread
    * a hot key, not be unique (byte-identical duplicate rows DO share one
    * bucket; a duplicate-dominated hot key needs upstream dedup first).
    *
    * MapType columns can't feed `hash` (unordered entries — Spark rejects
    * them under the default `spark.sql.legacy.allowHashOnMapType=false`), so
    * they are hashed through a sorted-entry canonical form instead of being
    * dropped from the salt input.
    */
  private def rowSalt(df: DataFrame, saltBuckets: Int): Column = {
    val hashable = df.schema.fields.map { f =>
      f.dataType match {
        case m: org.apache.spark.sql.types.MapType =>
          // canonical order: sort entries by key so equal maps salt equally
          val entries = map_entries(col(f.name))
          to_json(array_sort(entries, (a, b) =>
            when(a.getField("key") < b.getField("key"), -1)
              .when(a.getField("key") > b.getField("key"), 1).otherwise(0)))
        case _ => col(f.name)
      }
    }
    pmod(hash(hashable.toSeq: _*), lit(saltBuckets))
  }

  /** Salted broadcast-side replication for a skewed join: explode the small
    * side over all salt values so the big side's (key, salt) hits exactly one
    * replica. Use when one probe key dominates and the build side is small
    * enough to replicate `saltBuckets` times.
    */
  def saltBigSide(big: DataFrame, saltBuckets: Int): DataFrame =
    big.withColumn("_salt", rowSalt(big, saltBuckets))

  def replicateSmallSide(small: DataFrame, saltBuckets: Int): DataFrame =
    small.withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
}
