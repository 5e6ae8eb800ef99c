package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch invariants: one-sided error, merge associativity
  * (merge-of-sketches == sketch-of-union), heavy-hitter recovery on a
  * skewed stream, and the distributed aggregator path.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def zipfStream(n: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    // ~zipf over 1..1000: heavy head, long tail
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      math.min(1000L, math.max(1L, math.round(math.pow(u, -0.7))))
    }
  }

  test("point estimates never undercount; overcount bounded by eps * N") {
    val xs = zipfStream(20000, 7L)
    val truth = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val grid = xs.foldLeft(CountMin.empty)((g, v) => CountMin.add(g, v))
    assert(CountMin.totalWeight(grid) === xs.size.toLong)
    // one-sided: estimate >= true count, always
    truth.foreach { case (k, c) =>
      assert(CountMin.estimate(grid, k) >= c, s"undercount for $k")
    }
    // eps = e/W bound holds with big margin for the hot keys
    val epsN = math.ceil(math.E / CountMin.W * xs.size).toLong
    truth.filter(_._2 > 100).foreach { case (k, c) =>
      assert(CountMin.estimate(grid, k) <= c + 4 * epsN,
        s"estimate ${CountMin.estimate(grid, k)} too far above $c for $k")
    }
  }

  test("merge of partial sketches equals the sketch of the union") {
    val (a, b) = zipfStream(8000, 11L).splitAt(3000)
    val ga = a.foldLeft(CountMin.empty)((g, v) => CountMin.add(g, v))
    val gb = b.foldLeft(CountMin.empty)((g, v) => CountMin.add(g, v))
    val whole = (a ++ b).foldLeft(CountMin.empty)((g, v) => CountMin.add(g, v))
    assert(CountMin.merge(ga, gb).toSeq === whole.toSeq)
  }

  test("heavy hitters recovered from the sketch match exact top-k") {
    val xs = zipfStream(30000, 23L)
    val truth = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val grid = xs.foldLeft(CountMin.empty)((g, v) => CountMin.add(g, v))
    val exactTop = truth.toSeq.sortBy { case (k, c) => (-c, k) }.take(5).map(_._1)
    val sketchTop = truth.keys.toSeq
      .sortBy(k => (-CountMin.estimate(grid, k), k)).take(5)
    assert(sketchTop.toSet === exactTop.toSet,
      s"sketch top-5 $sketchTop != exact top-5 $exactTop")
  }

  test("distributed aggregator: per-group sketches estimate group frequencies") {
    val rows = zipfStream(10000, 31L).zipWithIndex
      .map { case (v, i) => (i % 4, v) } // 4 groups, same distribution
    val df = rows.toDF("g", "v").repartition(4)
    val sketches = df.groupBy("g")
      .agg(CountMinFunctions.cms_sketch(col("v")).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    assert(sketches.size === 4)
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val truth = grp.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      assert(CountMin.totalWeight(sketches(g)) === grp.size.toLong)
      truth.foreach { case (k, c) =>
        assert(CountMin.estimate(sketches(g), k) >= c)
      }
    }
    // rollup: merging the 4 stored sketches == sketching everything at once
    val merged = spark.createDataFrame(
        sketches.values.toSeq.map(Tuple1.apply)).toDF("sk")
      .agg(CountMinFunctions.cms_merge(col("sk")).as("m"))
      .collect()(0).getSeq[Long](0).toArray
    val whole = rows.map(_._2).foldLeft(CountMin.empty)((g, v) => CountMin.add(g, v))
    assert(merged.toSeq === whole.toSeq)
  }
}
