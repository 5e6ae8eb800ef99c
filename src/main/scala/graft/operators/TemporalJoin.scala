package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single right row with the
  * greatest `rightTs <= leftTs` for the key — i.e. "the dimension as it was
  * when the event happened".
  *
  * This restores the reference's lookup-at-event-time semantics
  * (DimAsyncFunction reads Phoenix at processing time,
  * app/function/DimAsyncFunction.java:17-71) that a snapshot broadcast join
  * approximates (DIVERGENCES.md): join facts against a VERSIONED dim history
  * instead of the latest snapshot and racing updates resolve exactly.
  *
  * Implementation is composed from built-ins (SURVEY §7.3 preference (a)):
  * equi-join on the key with the time bound as a residual, then
  * max_by(row, version-ts) per left row — one shuffle on the key, partial
  * aggregation applies, no custom SparkPlan needed. At 100 TB the join blowup
  * is bounded by versions-per-key (dim history depth), the same bound any
  * SCD2 store carries.
  */
object TemporalJoin {

  /** left ⋈asof right. `rightTs` must be a column of `right`; all right
    * columns are prefixed to avoid collisions. Left rows with no version
    * at-or-before their timestamp keep null right columns (left join).
    *
    * Every left row appears exactly once — including exact duplicates: rows
    * are tagged with a surrogate id before the join and collapsed per id, so
    * two identical facts both survive (and non-groupable left columns like
    * maps are carried in the grouped payload, never grouped on).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, prefix: String = "r_"): DataFrame = {
    val renamed = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
    val rKey = s"$prefix$key"
    val rTs = s"$prefix$rightTs"
    val tagged = left.withColumn("_asof_id", monotonically_increasing_id())
    val joined = tagged.join(renamed,
      tagged(key) === renamed(rKey) && renamed(rTs) <= tagged(leftTs), "left")
    val rightCols = renamed.columns
    val leftCols = left.columns
    // collapse to the latest version per left row: group on the surrogate id
    // (any left value is constant within a group — first() re-attaches it)
    // and take max_by over the struct of all right columns keyed by the
    // version timestamp
    joined
      .groupBy(col("_asof_id"))
      .agg(
        first(struct(leftCols.map(c => tagged(c)): _*)).as("_l"),
        max_by(struct(rightCols.map(col): _*), col(rTs)).as("_r"))
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_r.$c").as(c)): _*)
      .drop(rKey)
  }
}
