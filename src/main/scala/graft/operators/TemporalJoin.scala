package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Implementation is composed from built-ins (SURVEY §7.3 preference (a)) as
  * a union + running window — the classic sort-merge as-of shape: tag each
  * side, union on (key, ts), and carry the latest right payload forward with
  * `last(_, ignoreNulls) over (partition by key order by ts rows unbounded
  * preceding)`. One shuffle on the key, a streaming O(1)-memory window frame
  * (UnboundedPreceding running frame — no buffering), and crucially NO
  * surrogate row id: an earlier formulation tagged left rows with
  * `monotonically_increasing_id` and collapsed per id, which is the
  * SPARK-23207 recompute hazard (a partially-refetched map stage can
  * reassign ids, splitting/merging groups). The union form has no
  * nondeterministic column anywhere, and unlike the equi-join + max_by form
  * its cost is O(|left| + |history|) per key rather than
  * O(|left| × versions-per-key) — the shape that survives 100 TB with deep
  * dim histories.
  */
object TemporalJoin {

  /** left ⋈asof right. `rightTs` must be a column of `right`; all right
    * columns are prefixed to avoid collisions and the prefixed join key is
    * dropped from the output. Left rows with no version at-or-before their
    * timestamp keep null right columns (left-join semantics); a null left
    * key or null left timestamp never matches (join-style null semantics);
    * duplicate left rows each survive, and non-groupable left columns
    * (maps) ride in the payload struct untouched.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, prefix: String = "r_"): DataFrame = {
    val renamed = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
    val rKey = s"$prefix$key"
    val rTs = s"$prefix$rightTs"
    val leftCols = left.columns
    val rightCols = renamed.columns

    val lPayload = struct(leftCols.map(left(_)): _*)
    val rPayload = struct(rightCols.map(renamed(_)): _*)
    val lStructType = left.select(lPayload).schema.head.dataType
    val rStructType = renamed.select(rPayload).schema.head.dataType
    val tsType = left.schema(leftTs).dataType

    // side 0 = dim version, side 1 = fact: at equal timestamps the version
    // sorts first, making the bound inclusive (rightTs <= leftTs)
    val lSide = left.select(
      col(key).as("_k"), col(leftTs).as("_t"), lit(1).as("_side"),
      lPayload.as("_l"), lit(null).cast(rStructType).as("_r"))
    val rSide = renamed
      // a null right key can never match any left row — drop before union
      .filter(col(rKey).isNotNull && col(rTs).isNotNull)
      .select(
        col(rKey).as("_k"), col(rTs).cast(tsType).as("_t"), lit(0).as("_side"),
        lit(null).cast(lStructType).as("_l"), rPayload.as("_r"))

    // null left key / null left ts sort before every version (nulls first)
    // → running last(_r) is still null at that row = no match, as a join
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc_nulls_first, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("_rlast", last(col("_r"), ignoreNulls = true).over(w))
      // null-key facts partition together with nothing to match (null-key
      // versions were filtered out) — blank any carried value defensively
      .withColumn("_rlast", when(col("_k").isNull || col("_t").isNull,
        lit(null).cast(rStructType)).otherwise(col("_rlast")))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.`$c`").as(c)) ++
        rightCols.map(c => col(s"_rlast.`$c`").as(c)): _*)
      .drop(rKey)
  }
}
