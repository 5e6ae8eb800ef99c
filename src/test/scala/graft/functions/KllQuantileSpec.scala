package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL quantile-sketch invariants: exact weight conservation, bounded rank
  * error on a known stream, merge-of-sketches staying within the same bound
  * (any merge order), and the distributed aggregator + rollup path over the
  * real fixture.
  */
class KllQuantileSpec extends SparkSpec {
  import spark.implicits._

  // generous empirical bound for K = 200 (theory is ~1/K w.h.p.)
  private val Eps = 0.03

  private def stream(n: Int, seed: Long): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => rnd.nextGaussian() * 100.0 + 500.0)
  }

  private def trueRank(xs: Seq[Double], v: Double): Long =
    xs.count(_ < v).toLong

  test("weight is conserved exactly; quantile ranks within eps * N") {
    val xs = stream(20000, 11L)
    val s = xs.foldLeft(Kll.empty)((b, v) => Kll.add(b, v))
    assert(Kll.totalWeight(s) === xs.size.toLong)
    // the retained state is bounded (compaction works)
    assert(s.map(_.length).sum <= Kll.K * (s.length + 1))
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = Kll.quantile(s, q)
      val r = trueRank(xs, est)
      assert(math.abs(r - q * xs.size) <= Eps * xs.size,
        s"q=$q est=$est rank=$r target=${q * xs.size}")
    }
  }

  test("merge-of-sketches == sketch-of-union within the same rank bound") {
    val a = stream(8000, 1L)
    val b = stream(8000, 2L).map(_ + 300.0) // shifted: merge must interleave
    val c = stream(4000, 3L)
    val sa = a.foldLeft(Kll.empty)(Kll.add)
    val sb = b.foldLeft(Kll.empty)(Kll.add)
    val sc = c.foldLeft(Kll.empty)(Kll.add)
    val all = a ++ b ++ c
    // two different merge orders — both must satisfy the bound
    for (m <- Seq(Kll.merge(Kll.merge(sa, sb), sc),
        Kll.merge(sa, Kll.merge(sb, sc)))) {
      assert(Kll.totalWeight(m) === all.size.toLong)
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val r = trueRank(all, Kll.quantile(m, q))
        assert(math.abs(r - q * all.size) <= Eps * all.size, s"q=$q rank=$r")
      }
    }
  }

  test("rankOf inverts quantile within the bound") {
    val xs = stream(10000, 5L)
    val s = xs.foldLeft(Kll.empty)(Kll.add)
    for (q <- Seq(0.2, 0.5, 0.8)) {
      val est = Kll.rankOf(s, Kll.quantile(s, q)).toDouble
      assert(math.abs(est - q * xs.size) <= Eps * xs.size)
    }
  }

  test("distributed aggregator + stored-sketch rollup on the fixture (day→week shape)") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("double").as("x"))
    val n = docs.count()
    // one sketch per lang (the stored per-day shape), then rolled up by
    // merging STORED sketches — no rescan of the raw column
    val perLang = docs.groupBy("lang")
      .agg(KllFunctions.kll_sketch(col("x")).as("sk"))
    val rolled = perLang.agg(KllFunctions.kll_merge(col("sk")).as("sk"))
      .head.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("sk")
    val sketch = rolled.map(_.toArray).toArray
    assert(Kll.totalWeight(sketch) === n)
    val exact = docs.select("x").collect().map(_.getDouble(0)).sorted
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val est = Kll.quantile(sketch, q)
      val r = exact.count(_ < est)
      assert(math.abs(r - q * n) <= Eps * n + 1,
        s"q=$q est=$est rank=$r of $n")
    }
  }
}
