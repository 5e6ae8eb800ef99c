package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min frequency sketches as typed Aggregators — the FREQUENCY
  * companion to [[Hll]]'s cardinality sketches for unbounded streaming keys
  * (SURVEY §7.4.1). Where HLL answers "how many distinct", count-min answers
  * "about how often did THIS value occur" from constant state: a d×w counter
  * grid, each value hashed into one counter per row, point estimate = min
  * over its d counters (one-sided: never an undercount, overcount ≤ εN with
  * ε = e/w at probability 1−δ, δ = e^−d).
  *
  * Why not exact `count group by`? A per-key count over an unbounded
  * streaming key space grows state linearly with distinct keys — the same
  * failure mode HLL exists for. The sketch is 32 KiB FIXED, its merge is
  * element-wise addition (associative/commutative — safe as a partial-agg
  * buffer and for day→week rollups over STORED sketches without rescans),
  * and heavy-hitter queries only need point lookups over a candidate set
  * (e.g. g1's per-partition top-k survivors).
  *
  * The reference has no sketch family (its distinct sets are exact HashSets,
  * bean/ProductStats.java:77-87); this extends that row the same way
  * [[Hll]] does, for the 100 TB regime where exact per-key state cannot fit.
  */
object CountMin {
  val D = 4           // rows (δ = e^-4 ≈ 1.8%)
  val W = 1024        // counters per row (ε = e/1024 ≈ 0.27%)

  def empty: Array[Long] = new Array[Long](D * W)

  /** Row-i bucket of value v: splitmix64 over (v, row salt) — pairwise
    * independent enough in practice, engine-portable, no RNG state.
    */
  private def bucket(v: Long, row: Int): Int = {
    val h = Hll.hash64(v ^ (0x9e3779b97f4a7c15L * (row + 1)))
    ((h % W).toInt + W) % W
  }

  /** Observe one value with weight `inc` (mutates and returns `grid` —
    * Aggregator buffers are framework-owned between calls, so in-place
    * update is allocation-free and safe).
    */
  def add(grid: Array[Long], v: Long, inc: Long = 1L): Array[Long] = {
    var r = 0
    while (r < D) { grid(r * W + bucket(v, r)) += inc; r += 1 }
    grid
  }

  /** Sketch union = element-wise sum (mutates and returns `a`). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  /** Point frequency estimate: min over the value's d counters. */
  def estimate(grid: Array[Long], v: Long): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = grid(r * W + bucket(v, r))
      if (c < m) m = c
      r += 1
    }
    m
  }

  /** Total observed weight (any single row sums to N). */
  def totalWeight(grid: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < W) { s += grid(i); i += 1 }
    s
  }
}

/** `Array[Long]`-sketch-producing aggregator over long values: one storable
  * 32 KiB sketch per group row, mergeable downstream.
  */
class CountMinSketchAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  def zero: Array[Long] = CountMin.empty
  def reduce(b: Array[Long], v: Long): Array[Long] = CountMin.add(b, v)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = CountMin.merge(a, b)
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merge-of-stored-sketches aggregator: rolls up persisted sketch columns
  * (day→week, province→country) without touching raw data.
  */
class CountMinMergeAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  def zero: Array[Long] = CountMin.empty
  def reduce(b: Array[Long], s: Array[Long]): Array[Long] = CountMin.merge(b, s)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = CountMin.merge(a, b)
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinFunctions {
  /** Column aggregator: count-min sketch of a long column. */
  def cms_sketch(c: Column): Column = udaf(new CountMinSketchAgg).apply(c)
  /** Column aggregator: union of stored sketches. */
  def cms_merge(c: Column): Column = udaf(new CountMinMergeAgg).apply(c)
}
