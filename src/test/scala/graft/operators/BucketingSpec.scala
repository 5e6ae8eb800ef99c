package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The bucketed co-located join contract: same-bucketed tables join with
  * ZERO Exchange operators (the recurring shuffle is paid once at write
  * time), and the result is identical to the plain shuffled join.
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join shuffle-free and match the plain join") {
    val orders = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
      .withColumnRenamed("c_custkey", "o_custkey")

    Bucketing.writeBucketed(orders, "bkt_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "bkt_customer", "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the sort-merge path the
      // layout exists for (at 100 TB neither side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bkt_orders", "bkt_customer", "o_custkey")
      joined.count() // materialize through AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // bucket metadata: scans report the selected bucket count
      assert(plan.contains("SelectedBucketsCount"), plan)

      // identical rows to the plain (shuffled) join
      val plain = orders.join(customer, "o_custkey")
      assert(joined.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("bucket pruning: a point lookup touches one bucket per side") {
    val orders = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketing.writeBucketed(orders, "bkt_orders_prune", "o_custkey", 8)
    // auto-bucketed-scan would fall back to a plain scan for a bucket-less
    // plan shape; force the bucketed layout so the filter can prune buckets
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val key = orders.select("o_custkey").head.getLong(0)
      val q = spark.table("bkt_orders_prune").filter(col("o_custkey") === key)
      q.count()
      val plan = q.queryExecution.executedPlan.toString
      // "SelectedBucketsCount: 1 out of 8" — only the key's bucket is read
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing:\n$plan")
      assert(q.count() === orders.filter(col("o_custkey") === key).count())
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS bkt_orders_prune")
    }
  }

  test("zorderKey is injective on the domain; z-layout tightens both-dim bounding boxes (L1)") {
    import org.apache.spark.sql.functions._
    val z = Bucketing.zorderEvents(graft.Tables.table(spark, sf, "events")).cache()
    // Morton interleave is a bijection: distinct pairs == distinct keys
    val pairs = z.select("user_id", "k").distinct().count()
    assert(z.select("zkey").distinct().count() === pairs)
    // de-interleave spot check: odd bits rebuild x, even bits rebuild y
    val back = z.limit(50).collect().forall { r =>
      val (x, y, zk) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val rx = (0 until 16).map(i => ((zk >> (2 * i + 1)) & 1L) << i).sum
      val ry = (0 until 16).map(i => ((zk >> (2 * i)) & 1L) << i).sum
      rx == math.min(math.max(x, 0L), 65535L) && ry == math.min(math.max(y, 0L), 65535L)
    }
    assert(back, "de-interleave failed")

    // locality: 16 equal-count z-range partitions must have a SMALLER mean
    // (user_id × k) bounding-box area than 16 arrival-order partitions —
    // that area is exactly what per-file min/max stats can prune against
    def meanArea(keyed: org.apache.spark.sql.DataFrame): Double =
      keyed.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(((max("user_id") - min("user_id") + 1) *
          (max("k") - min("k") + 1)).as("area"))
        .agg(avg("area")).head.getDouble(0)
    val zArea = meanArea(z.repartitionByRange(16, col("zkey")))
    val naiveArea = meanArea(z.repartitionByRange(16, col("event_id")))
    assert(zArea < naiveArea * 0.5,
      s"z-order layout not tighter: z=$zArea vs naive=$naiveArea")
    z.unpersist()
  }

  test("compactionPlan bin-packs first-fit-in-order within each slice (L2)") {
    import org.apache.spark.sql.functions._
    val target = 16384L
    val plan = Bucketing.compactionPlan(spark, sf).cache()
    // every eligible doc planned exactly once
    val docs = graft.Tables.table(spark, sf, "documents")
    assert(plan.count() === docs.count())
    // file indices start at 0 in every slice and are gapless
    val idx = plan.groupBy("lang", "shard")
      .agg(min("file_idx").as("lo"), max("file_idx").as("hi"),
        countDistinct("file_idx").as("nf"))
    assert(idx.filter(col("lo") =!= 0L).count() === 0)
    assert(idx.filter(col("nf") =!= col("hi") + 1).count() === 0, "gap in file indices")
    // first-fit invariant: a doc starts a new file iff the bytes before it
    // crossed the target — file size (bytes before last member + its own
    // size) never exceeds target + the member's size
    val sizes = plan.join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("lang", "shard", "file_idx")
      .agg(sum("n_chars").as("bytes"), max("n_chars").as("biggest"))
    assert(sizes.filter(col("bytes") > lit(target) + col("biggest")).count() === 0,
      "a planned file exceeds target + one document")
    // and non-final files come within one document of the target (a file
    // closes only because the NEXT doc crossed the boundary, so it can
    // fall short by at most the largest doc in its slice)
    val lastIdx = plan.groupBy("lang", "shard").agg(max("file_idx").as("last"))
    val sliceMax = plan.join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("lang", "shard").agg(max("n_chars").as("mx"))
    val nonFinal = sizes.join(lastIdx, Seq("lang", "shard"))
      .filter(col("file_idx") < col("last"))
      .join(sliceMax, Seq("lang", "shard"))
    assert(nonFinal.filter(col("bytes") < lit(target) - col("mx")).count() === 0,
      "a non-final file was closed more than one document short of the target")
    plan.unpersist()
  }

  test("skippingStats: z-order layout never reads more than arrival; counts reconcile (L4)") {
    import org.apache.spark.sql.functions._
    val events = Tables.table(spark, sf, "events")
    val out = Bucketing.skippingStats(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set("arrival", "zorder"))
    val (af, at, ar, am) = out("arrival")
    val (zf, zt, zr, zm) = out("zorder")
    // the predicate matches the same rows whatever the layout
    assert(am === zm && am > 0, "predicate must select rows in the fixture")
    // every matched row is inside a touched file (skipping is sound)
    assert(ar >= am && zr >= zm)
    assert(at <= af && zt <= zf)
    // the z-order win: the clustered layout reads no more rows than the
    // arrival layout for the same box predicate (strictly fewer once the
    // corpus spans multiple files — at sf0.001 arrival is one file)
    assert(zr <= ar, s"z-order read $zr rows where arrival read $ar")
    // independent recompute of the matched-row truth
    val truth = Bucketing.zorderEvents(events)
      .filter(col("user_id") <= 31 && col("k") <= 31).count()
    assert(am === truth)
  }

  test("hilbert_key: bijective gray walk — every curve step moves ONE cell (L5)") {
    import graft.functions.HilbertIndex.xy2d
    // order-4 curve over the full 16x16 grid: d must be a bijection onto
    // 0..255 and consecutive curve positions must be grid-ADJACENT
    // (Manhattan distance exactly 1) — the locality property Morton lacks
    // (the Z-curve jumps diagonally at every power-of-two boundary)
    val byD = (for (x <- 0 until 16; y <- 0 until 16)
      yield xy2d(4, x.toLong, y.toLong) -> ((x, y))).sortBy(_._1)
    assert(byD.map(_._1) === (0L until 256L))
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // clamping matches zorderKey's convention: out-of-domain pins to the
    // grid edge, order-preserving at the boundary
    assert(xy2d(4, -5L, 3L) === xy2d(4, 0L, 3L))
    assert(xy2d(4, 99L, 3L) === xy2d(4, 15L, 3L))
  }

  test("hilbert segments have tighter bounding boxes than Morton's (L5 locality)") {
    import graft.functions.HilbertIndex.xy2d
    // order-8 grid cut into fixed 1000-position files (real writers close
    // files on ROW COUNT, so boundaries do NOT align to the curves'
    // power-of-four quads — aligned segments are perfect rectangles under
    // BOTH curves and hide the difference): total bounding-box AREA over
    // all files is the quantity min/max skipping prunes by. Hilbert's
    // every-step-adjacent walk must beat the Z-curve's diagonal jumps in
    // aggregate (measured ~45% tighter). Pure integer math, no Spark.
    def zkey(x: Long, y: Long): Long =
      (0 until 8).map { i => (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i)) }.sum
    def segArea(key: (Long, Long) => Long): Long = {
      val cells = for (x <- 0L until 256L; y <- 0L until 256L) yield (key(x, y) / 1000L, x, y)
      cells.groupBy(_._1).values.map { seg =>
        val xs = seg.map(_._2); val ys = seg.map(_._3)
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }.sum
    }
    val h = segArea((x, y) => xy2d(8, x, y))
    val z = segArea(zkey)
    assert(h * 10 < z * 6, s"hilbert total segment bbox area $h not well under morton $z")
  }

  test("layoutCompare: hilbert skips at least as well as arrival; parity with native key (L5)") {
    import org.apache.spark.sql.functions._
    val events = Tables.table(spark, sf, "events")
    val out = Bucketing.layoutCompare(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set("arrival", "zorder", "hilbert"))
    val (_, _, ar, am) = out("arrival")
    val (_, _, hr, hm) = out("hilbert")
    assert(am === hm && am > 0)
    assert(hr >= hm && hr <= ar, s"hilbert read $hr vs arrival $ar")
    // codegen'd expression, interp agreement on the corpus keys
    val keyed = Bucketing.zorderEvents(events).withColumn("hkey",
      graft.functions.HilbertIndex.hilbert_key(col("user_id"), col("k")))
    val codegen = keyed.select("event_id", "hkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    codegen.take(50).foreach { case (_, k) => assert(k >= 0L) }
    // collect ONCE: limit without an ordering can return different rows on
    // each execution, so each row's hkey must be compared against xy2d of
    // that SAME row's (user_id, k)
    keyed.limit(50).collect().foreach { r =>
      val expect = graft.functions.HilbertIndex.xy2d(16,
        math.min(math.max(r.getAs[Long]("user_id"), 0L), 65535L),
        math.min(math.max(r.getAs[Long]("k"), 0L), 65535L))
      assert(r.getAs[Long]("hkey") === expect)
    }
  }
}
