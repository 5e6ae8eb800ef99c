package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnnOpsSpec extends SparkSpec {

  test("IVF quantization: centroids per cell, assignment matches given labels") {
    val e = Tables.table(spark, sf, "embeddings")
    val cents = AnnOps.centroids(e, "label")
    val nCells = e.select("label").distinct().count()
    assert(cents.count() === nCells)
    assert(cents.selectExpr("size(centroid)").distinct().head.getInt(0) === 64)

    // the synthetic labels are only weakly spatial (≈37% recoverable) —
    // assert assignment agreement is well above the 1/nCells chance level,
    // i.e. the quantizer finds whatever structure exists
    val assigned = AnnOps.assignCells(e, cents)
    val agree = assigned.join(e.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("assigned_cell") === col("label")).count()
    val total = e.count()
    assert(agree * nCells >= total * 2, // ≥ 2× chance
      s"only $agree/$total assignments agree (chance = ${total / nCells})")
    assert(assigned.count() === total) // every vector assigned exactly once
  }

  test("literal-centroid assignment matches the join-based batch form; map-only plan") {
    val e = Tables.table(spark, sf, "embeddings")
    val cents = AnnOps.centroids(e, "label")
    val batch = AnnOps.assignCells(e, cents)
      .select("vec_id", "assigned_cell")
    val lit = AnnOps.assignCellsLit(e, AnnOps.collectCentroids(cents))
      .select("vec_id", "assigned_cell")
    assert(lit.exceptAll(batch).count() === 0 && batch.exceptAll(lit).count() === 0)
    // stateless per-row projection: no exchange anywhere in the plan
    val plan = lit.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("embeddingNearDups flags planted duplicates within a cell (D6)") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),  // exact dup pair in cell 0
      (2L, Array(1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0),  // orthogonal — not a dup
      (4L, Array(0.0f, 0.0f, 1.0f), 2),  // alone in cell 2 → no candidate row
      (5L, Array(0.0f, 0.9f, 0.1f), 1),
      (6L, Array(0.0f, 0.9f, 0.1f), 1))  // dup of 5 in cell 1
      .toDF("vec_id", "embedding", "label")
    val out = AnnOps.embeddingNearDups(e, threshold = 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("nn_id"), r.getAs[Double]("sim"), r.getAs[Boolean]("is_dup"))).toMap
    assert(out(1L) === ((2L, 1.0, true)))
    assert(out(2L) === ((1L, 1.0, true)))
    assert(out(3L)._3 === false)          // nearest is orthogonal, not flagged
    assert(!out.contains(4L))             // singleton cell: no pair to compare
    assert(out(5L) === ((6L, 1.0, true)))
    // cell boundary respected: 3's neighbor must be in cell 0
    assert(Set(1L, 2L).contains(out(3L)._1))

    // corpus removal keeps the lower id of each dup pair and all non-dups
    val kept = AnnOps.dropEmbeddingNearDups(e, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
  }

  test("ivf results are a subset of brute-force candidates per query") {
    val e = Tables.table(spark, sf, "embeddings")
    val ivf = AnnOps.ivfTopK(e)
    // every IVF neighbor must share the query's cell
    val labels = e.select(col("vec_id"), col("label"))
    val bad = ivf
      .join(labels.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nl"), "neighbor_id")
      .filter(col("nl") =!= col("cell"))
    assert(bad.count() === 0)
  }

  test("SRP-LSH: identical vectors share all bands and rank each other first (N3)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val twin = vec()
    // vec 0 and 1 are identical queries; 20..79 corpus noise
    val rows = Seq(0L -> twin, 1L -> twin) ++ (20L until 80L).map(_ -> vec())
    val e = rows.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")

    val out = AnnOps.lshTopK(e).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    // identical vectors have identical signatures ⇒ candidates in every band,
    // and cosine 1.0 beats any random neighbor
    for ((q, other) <- Seq(0L -> 1L, 1L -> 0L)) {
      val top = byQuery(q).minBy(_.getAs[Long]("rnk"))
      assert(top.getAs[Long]("neighbor_id") === other)
      assert(top.getAs[Double]("sim") === 1.0)
    }
    // k bound and rank/sim coherence per query
    assert(byQuery.values.forall(_.length <= 5))
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b })
    }
    // every returned neighbor really shares >= 1 band with its query (LSH
    // contract): recompute signatures and compare band slices
    val sig = e.select(col("vec_id"),
        AnnOps.lshSignature(col("embedding")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val shares = (0 until 4).exists(b => sig(q).slice(8 * b, 8 * b + 8) == sig(n).slice(8 * b, 8 * b + 8))
      assert(shares, s"pair ($q, $n) shares no signature band")
    }
  }

  test("filteredTopK scopes candidates to the query's label, exact vs brute force (N8)") {
    val e = Tables.table(spark, sf, "embeddings")
    val out = AnnOps.filteredTopK(spark, sf).cache()
    // every neighbor shares its query's label (the filter semantics)
    val lbl = e.select(col("vec_id"), col("label"))
    val badLabel = out
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .filter(col("ql") =!= col("nl")).count()
    assert(badLabel === 0, "a neighbor crossed the label filter")
    // exactness: driver-side brute force over the same quantized ordering
    val vecs = e.select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 10000.0 + 0.5) / 10000.0
    }
    val expected = (for {
      (qid, qv, ql) <- vecs.toSeq.filter(_._1 < 10)
      ((nid, s), idx) <- vecs.toSeq
        .filter { case (nid, _, nl) => nid != qid && nl == ql }
        .map { case (nid, nv, _) => (nid, sim(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(5).zipWithIndex
    } yield (qid, nid, (idx + 1).toLong, s)).toSet // (query, neighbor, rnk, sim)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
    out.unpersist()
  }

  test("knn labeling votes the planted neighborhood's label; tie-breaks deterministic (N7)") {
    import spark.implicits._
    // query 0 sits in a tight cluster of 5 'x'-labeled vectors; vectors
    // labeled 'z' are orthogonal — the majority vote MUST be 'x' even
    // though the query's own stored label is 'z' (agrees = false)
    def vec(a: Float, b: Float): Array[Float] = Array(a, b, 0f, 0f)
    val rows = Seq(
      (0L, vec(1f, 0.0f), "z"),
      (1L, vec(1f, 0.01f), "x"), (2L, vec(1f, 0.02f), "x"),
      (3L, vec(1f, 0.03f), "x"), (4L, vec(1f, 0.04f), "x"),
      (5L, vec(1f, 0.05f), "x"),
      (6L, vec(0f, 1f), "z"), (7L, vec(0.01f, 1f), "z"))
    val out = AnnOps.knnLabel(rows.toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(4)))).toMap
    // every vec_id < 50 is a query here
    assert(out.size === 8)
    assert(out(0L) === (("z", "x", 5L, false)), s"query 0 vote: ${out(0L)}")
    // cluster members vote each other (4 'x' + the z query among top-5)
    assert((1L to 5L).forall(out(_)._2 == "x"))
    assert((1L to 5L).forall(i => out(i)._4), "x members must agree")
    // one row per query, votes within [1, 5]
    assert(out.values.forall(v => v._3 >= 1 && v._3 <= 5))
  }

  test("int8 quantization invariants: max-abs lane saturates, L1 bounds, sign symmetry (N4)") {
    import spark.implicits._
    val e = Tables.table(spark, sf, "embeddings")
    val q = AnnOps.quantizeStats(e)
    // the lane holding the max |x| quantizes to exactly +-127 -> n_sat >= 1
    assert(q.filter(col("n_sat") < 1).count() === 0)
    // |sum| <= L1 mass <= 127 * dims
    assert(q.filter(abs(col("qsum")) > col("qabs")).count() === 0)
    assert(q.filter(col("qabs") > 127L * 64).count() === 0)
    // negating a vector negates the quantized sum and keeps L1/saturation
    // (exact .5 lanes excluded: floor-half-up is not odd-symmetric there)
    val v = Array(1f, 3f, 4f)
    val two = Seq((1L, v), (2L, v.map(x => -x))).toDF("vec_id", "embedding")
    val rows = AnnOps.quantizeStats(two).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(1L)._2 === rows(2L)._2 && rows(1L)._3 === rows(2L)._3)
    assert(rows(1L)._1 === -rows(2L)._1)
  }

  test("ivfSearch with all cells probed equals brute-force top-k; fewer probes trade recall") {
    val e = Tables.table(spark, sf, "embeddings")
    val cents = AnnOps.centroids(e, "label")
    val nCells = cents.count().toInt
    val queries = e.filter(col("vec_id") < 10)

    val brute = AnnOps.cosineTopK(e)
      .select("query_id", "neighbor_id", "rnk", "sim")
    val full = AnnOps.ivfSearch(e, cents, queries, 5, nCells)
      .select("query_id", "neighbor_id", "rnk", "sim")
    assert(full.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(full).count() === 0)

    // multi-probe with few cells: a valid top-k subset with partial recall
    val probe2 = AnnOps.ivfSearch(e, cents, queries, 5, 2)
    val recall = probe2.join(brute, Seq("query_id", "neighbor_id")).count()
    assert(probe2.count() <= 50)
    assert(recall > 0, "probing 2 cells recovered none of the true top-5")
  }

  test("kmeansTrain converges to stable cells; trained ivfSearch recalls brute-force truth") {
    val e = Tables.table(spark, sf, "embeddings")
    val k = 8
    val cents = AnnOps.kmeansTrain(e, k, maxIter = 15, tol = 1e-6)
    assert(cents.map(_._1).toSeq === (0 until k), "cells must survive training")
    // deterministic control flow: a re-run on the same layout agrees to
    // float rounding (double-sum merge order is the only free variable).
    // TrainMemo would serve the identical array back — clear it so this
    // asserts a GENUINE re-train, not the memo
    graft.operators.TrainMemo.clear()
    val again = AnnOps.kmeansTrain(e, k, maxIter = 15, tol = 1e-6)
    val worstRerun = cents.zip(again).map { case ((_, a), (_, b)) =>
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    }.max
    assert(worstRerun <= 1e-5f, s"re-trained centroids diverged by $worstRerun")
    // stability: assignments under the trained centroids reproduce the
    // centroids they were averaged from (one more Lloyd round moves < tol)
    val assigned = AnnOps.assignCellsLit(e, cents)
      .withColumnRenamed("assigned_cell", "cell")
    val re = AnnOps.collectCentroids(AnnOps.centroids(assigned, "cell")).toMap
    val worst = cents.map { case (c, v) =>
      re.get(c).fold(0.0)(n => math.sqrt(v.zip(n).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum))
    }.max
    assert(worst <= 1e-6, s"trained centroids not a Lloyd fixpoint: moved $worst")

    // recall vs n1 brute-force truth, LshRecallSpec-style: probing 3/8
    // trained cells must recover most true top-5 neighbors
    val centsDf = AnnOps.centroids(assigned, "cell")
    val queries = e.filter(col("vec_id") < 10)
    val brute = AnnOps.cosineTopK(e).select("query_id", "neighbor_id")
    val ivf = AnnOps.ivfSearch(e, centsDf, queries, 5, 3)
      .select("query_id", "neighbor_id")
    val truth = brute.count()
    val recalled = ivf.join(brute, Seq("query_id", "neighbor_id")).count()
    assert(truth === 50)
    assert(recalled * 2 >= truth,
      s"3-probe recall $recalled/$truth under trained quantizer")
  }

  test("persisted IVF index round-trips: search from the parquet index equals in-memory") {
    // the deployment shape ivfSearchAssigned exists for: assignment is paid
    // ONCE at indexing time, the index (cell-partitioned corpus + centroid
    // table) lives on disk, and search never re-quantizes — probing a cell
    // subset can prune to that subset's partitions on the indexed layout
    import spark.implicits._
    val e = Tables.table(spark, sf, "embeddings")
    val cents = AnnOps.kmeansTrain(e, 4)
    val assigned = AnnOps.assignCellsLit(e, cents)
      .withColumnRenamed("assigned_cell", "cell")
    val centsDf = cents.toSeq.toDF("cell", "centroid")
    val queries = e.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/corpus")
    centsDf.write.mode("overwrite").parquet(s"$dir/cents")
    val inMem = AnnOps.ivfSearchAssigned(assigned, centsDf, queries, 5, 2)
    val fromDisk = AnnOps.ivfSearchAssigned(
      spark.read.parquet(s"$dir/corpus"),
      spark.read.parquet(s"$dir/cents"), queries, 5, 2)
    assert(fromDisk.count() > 0)
    assert(fromDisk.exceptAll(inMem).count() === 0)
    assert(inMem.exceptAll(fromDisk).count() === 0)
    // the scale payoff of the cell-partitioned layout: the probe subset
    // dynamic-partition-prunes the index scan, so probing 2/k cells reads
    // only those partitions' bytes — search I/O follows probed cells, not
    // index size
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"persisted index scan is not partition-pruned:\n$plan")
  }

  test("n2b trained-IVF end-to-end recalls >= 50% of brute-force truth AT SF0.1") {
    // the n2b gate is behavioral (Lloyd's loop is not oracle-stateable), so
    // the recall bound runs at the BENCH scale factor, not the spec fixture:
    // this is the assertion that makes the bench-timed query a tested one
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(),
      "sf0.1 fixtures not present")
    val e = Tables.table(spark, dir, "embeddings")
    val brute = AnnOps.cosineTopK(e).select("query_id", "neighbor_id")
    val trained = AnnOps.ivfTrainedTopK(e).select("query_id", "neighbor_id")
    val truth = brute.count()
    val recalled = trained.join(brute, Seq("query_id", "neighbor_id")).count()
    assert(truth === 50) // 10 queries × top-5
    assert(recalled * 2 >= truth,
      s"trained 3/8-probe recall $recalled/$truth at sf0.1")
    // the BENCHED face spills to 2 cells per vector: same probe fraction,
    // strictly-superset candidates, so recall dominates the unspilled run
    // (measured 0.90 vs 0.72 here; asserted with margin for float drift)
    val spilled = AnnOps.ivfTrainedTopK(e, spill = 2)
      .select("query_id", "neighbor_id")
    val spillRecalled = spilled.join(brute, Seq("query_id", "neighbor_id")).count()
    assert(spillRecalled >= recalled,
      s"spill=2 recall $spillRecalled under unspilled $recalled")
    assert(spillRecalled * 10 >= truth * 7,
      s"spill=2 3/8-probe recall $spillRecalled/$truth at sf0.1")
  }

  test("n10 IVF×SQ8: probe-bounded candidates, exact rerank, recall >= 50% AT SF0.1") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(),
      "sf0.1 fixtures not present")
    val e = Tables.table(spark, dir, "embeddings")
    val brute = AnnOps.cosineTopK(e).select("query_id", "neighbor_id", "sim")
    val n10 = AnnOps.ivfQuantizedTopK(e)
    // reranked sims are the n1 float contract: any (query, neighbor) pair
    // present in both must carry the IDENTICAL 4-dp similarity
    val joined = n10.select(col("query_id"), col("neighbor_id"),
        col("sim").as("n10_sim"))
      .join(brute, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("n10_sim") =!= col("sim")).count() === 0,
      "rerank sim drifted from the brute-force contract")
    val truth = brute.count()
    val recalled = joined.count()
    assert(truth === 50)
    assert(recalled * 2 >= truth,
      s"3-probe IVF×SQ8 recall $recalled/$truth at sf0.1")
    // widening the probes can only add candidates: recall is monotone, and
    // probing every cell makes the candidate pass exhaustive
    val nCells = e.select("label").distinct().count().toInt
    val all = AnnOps.ivfQuantizedTopK(e, nProbe = nCells)
      .select("query_id", "neighbor_id")
      .join(brute, Seq("query_id", "neighbor_id")).count()
    assert(all >= recalled, s"all-probe recall $all under 3-probe $recalled")
  }

  test("n11 IVFADC: residual-PQ probe-bounded candidates, exact rerank, recall >= 50% AT SF0.1") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(),
      "sf0.1 fixtures not present")
    val e = Tables.table(spark, dir, "embeddings")
    val brute = AnnOps.cosineTopK(e).select("query_id", "neighbor_id", "sim")
    val n11 = AnnOps.ivfPqTopK(e)
    // reranked sims are the n1 float contract: any (query, neighbor) pair
    // present in both must carry the IDENTICAL 4-dp similarity
    val joined = n11.select(col("query_id"), col("neighbor_id"),
        col("sim").as("n11_sim"))
      .join(brute, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("n11_sim") =!= col("sim")).count() === 0,
      "rerank sim drifted from the brute-force contract")
    val truth = brute.count()
    val recalled = joined.count()
    assert(truth === 50)
    assert(recalled * 2 >= truth,
      s"4-probe IVFADC recall $recalled/$truth at sf0.1")
    // widening the candidate list can only help: the ADC ordering is an
    // approximation, so a larger rerank pool dominates the smaller one
    val wide = AnnOps.ivfPqTopK(e, cand = 400)
      .select("query_id", "neighbor_id")
      .join(brute, Seq("query_id", "neighbor_id")).count()
    assert(wide >= recalled, s"cand=400 recall $wide under cand=150 $recalled")
  }

  test("sample-trained quantizer: full cell coverage, searchable, recall survives (100 TB train path)") {
    val e = Tables.table(spark, sf, "embeddings")
    // train on ~40% of vectors, assign and search EVERYTHING
    val cents = AnnOps.kmeansTrain(e, 4, 10, 1e-4, trainFrac = 0.4)
    assert(cents.map(_._1).toSeq === (0 until 4), "sampled training lost cells")
    cents.foreach { case (c, v) =>
      assert(v.nonEmpty && v.forall(x => !x.isNaN), s"cell $c degenerate centroid")
    }
    import spark.implicits._
    val assigned = AnnOps.assignCellsLit(e, cents)
      .withColumnRenamed("assigned_cell", "cell")
    // every vector (sampled or not) gets a cell; all cells in range
    assert(assigned.filter(col("cell").isNull ||
      col("cell") < 0 || col("cell") >= 4).count() === 0)
    val centsDf = cents.toSeq.toDF("cell", "centroid")
    val res = AnnOps.ivfSearchAssigned(assigned, centsDf,
      e.filter(col("vec_id") < 10), 5, 2)
    val brute = AnnOps.cosineTopK(e).select("query_id", "neighbor_id")
    val recalled = res.join(brute, Seq("query_id", "neighbor_id")).count()
    assert(recalled * 4 >= brute.count(),
      s"sample-trained 2/4-probe recall collapsed: $recalled/${brute.count()}")
    // determinism: the hash-sampled train set is layout-independent
    val again = AnnOps.kmeansTrain(e.repartition(7), 4, 10, 1e-4, trainFrac = 0.4)
    val worst = cents.zip(again).map { case ((_, a), (_, b)) =>
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    }.max
    assert(worst <= 1e-4f, s"sampled training diverged across layouts by $worst")
  }

  test("spilled assignment: rank-1 matches single assignment, spill rows distinct per vector") {
    val e = Tables.table(spark, sf, "embeddings")
    val cents = AnnOps.kmeansTrain(e, 4)
    val n = e.count()
    val spill = AnnOps.assignCellsLitSpill(e, cents, 2)
    // 2 rows per vector, and the pair is two DIFFERENT cells
    assert(spill.count() === 2 * n)
    assert(spill.select("vec_id", "assigned_cell").distinct().count() === 2 * n)
    // the best-ranked spilled cell is byte-identical to assignCellsLit's
    // argmax (same tie-break), so spill=1 degenerates to the single path
    val single = AnnOps.assignCellsLit(e, cents)
      .select(col("vec_id"), col("assigned_cell").as("best"))
    val first = AnnOps.assignCellsLitSpill(e, cents, 1)
      .select(col("vec_id"), col("assigned_cell").as("top1"))
    assert(single.join(first, "vec_id")
      .filter(col("best") =!= col("top1")).count() === 0)
    // search over a spilled index with dedup never emits a duplicate
    // (query, neighbor) pair and never exceeds k rows per query
    import spark.implicits._
    val centsDf = cents.toSeq.toDF("cell", "centroid")
    val assigned = spill.withColumnRenamed("assigned_cell", "cell")
    val res = AnnOps.ivfSearchAssigned(assigned, centsDf,
      e.filter(col("vec_id") < 5), 5, 2, dedupCandidates = true)
    assert(res.select("query_id", "neighbor_id").distinct().count() === res.count())
    assert(res.groupBy("query_id").count().filter(col("count") > 5).count() === 0)
  }

  test("semantic decontamination covers exactly the non-benchmark corpus; sims bounded") {
    val e = Tables.table(spark, sf, "embeddings")
    val d = AnnOps.semanticDecontaminate(e).cache()
    val nBench = e.filter(col("vec_id") % 97 === 0).count()
    assert(nBench > 0, "fixture must contain benchmark vectors")
    assert(d.count() === e.count() - nBench)
    assert(d.filter(col("vec_id") % 97 === 0).count() === 0)
    assert(d.filter(col("max_sim") < -1.0001 || col("max_sim") > 1.0001).count() === 0)
    assert(d.filter(col("is_contaminated") =!= (col("max_sim") >= 0.95)).count() === 0)
    // max_sim really is the max: no single benchmark similarity may exceed it
    val bench = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("bench_id"), col("embedding").as("be"))
    import graft.functions.VectorFunctions.{dot_f, norm_f}
    val one = e.filter(col("vec_id") % 97 =!= 0).limit(5)
      .crossJoin(broadcast(bench))
      .select(col("vec_id"),
        (dot_f(col("embedding"), col("be")) /
          (norm_f(col("embedding")) * norm_f(col("be")))).as("s"))
      .groupBy("vec_id").agg(max(floor(col("s") * 10000.0 + 0.5) / 10000.0).as("chk"))
    val bad = one.join(d, "vec_id").filter(abs(col("chk") - col("max_sim")) > 1e-9)
    assert(bad.count() === 0)
    d.unpersist()
  }

  test("pqEncode recovers planted codes map-only; pqAdcTopK is well-formed (N6)") {
    import spark.implicits._
    // hand-built codebook: subspace s, code j → a one-hot-ish vector far from
    // every other code, so a vector assembled FROM codebook entries must
    // encode back to exactly those codes (distance 0 to its own code)
    val cb = (for (s <- 0 until 8; j <- 0 until 16) yield {
      val c = Array.tabulate(8)(p => if (p == j % 8) (j + 1).toDouble else 0.0)
      ((s, j), (c, c.foldLeft(0.0)((a, x) => a + x * x)))
    }).toMap
    val planted = Seq(3, 7, 0, 15, 9, 1, 12, 5)
    val v = planted.zipWithIndex.flatMap { case (j, _) =>
      (0 until 8).map(p => if (p == j % 8) (j + 1).toFloat else 0.0f)
    }.toArray
    val enc = AnnOps.pqEncode(Seq((1L, v)).toDF("vec_id", "embedding"), cb)
    assert(enc.select("codes").head.getSeq[Int](0) === planted)
    // stateless per-row projection — no exchange anywhere (assignCellsLit contract)
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))

    // the fixture-corpus face: 10 queries × top-5, ranks dense, distances
    // non-negative and non-decreasing in rank
    val e = Tables.table(spark, sf, "embeddings")
    val out = AnnOps.pqAdcTopK(e).cache()
    assert(out.count() === 50)
    assert(out.filter(col("adist") < 0).count() === 0)
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rnk")
    val mono = out.withColumn("prev", lag(col("adist"), 1).over(w))
      .filter(col("prev").isNotNull && col("adist") < col("prev"))
    assert(mono.count() === 0, "ADC distance must be non-decreasing in rank")
    out.unpersist()
  }

  test("semDedup keeps the cluster outlier of a dup pair, ties to min id (D16)") {
    import spark.implicits._
    val e = Seq(
      // cell 0: v1/v2 near-identical direction (cos ≈ 0.994); the centroid
      // leans toward their shared direction PLUS v3, so v2 (closer to the
      // centroid) is the one SemDeDup drops and v1 (the outlier) survives
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0), // orthogonal — never a dup edge
      // cell 1: singleton — no candidate pair, always kept
      (4L, Array(0.5f, 0.5f, 0.5f), 1),
      // cell 2: exact tie in cent_sim — lower vec_id wins
      (5L, Array(0.0f, 0.0f, 1.0f), 2),
      (6L, Array(0.0f, 0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = AnnOps.semDedup(e, threshold = 0.9)
    assert(out.count() === 6)
    val keep = out.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(keep === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> true, 5L -> true, 6L -> false), keep.toString)
    // the kept member of the (1, 2) pair really is the centroid outlier
    val cs = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(cs(1L) < cs(2L), s"outlier rule violated: ${cs(1L)} vs ${cs(2L)}")
  }

  test("semDedupTrained runs the full learned-quantizer pipeline (D16 production face)") {
    val e = Tables.table(spark, sf, "embeddings")
    val out = AnnOps.semDedupTrained(e, k = 8, threshold = 0.35).cache()
    assert(out.count() === e.count(), "every vector scored exactly once")
    // learned cells are k-bounded and every vector landed in one
    val cells = out.select("label").distinct().count()
    assert(cells >= 1 && cells <= 8, s"unexpected cell count $cells")
    assert(out.filter(col("cent_sim") < -1.0001 || col("cent_sim") > 1.0001).count() === 0)
    out.unpersist()
  }

  test("quantizedTopK recalls brute-force truth through the int8 candidate scan (N9)") {
    val e = Tables.table(spark, sf, "embeddings")
    val brute = AnnOps.cosineTopK(e).select("query_id", "neighbor_id")
    val sq8 = AnnOps.quantizedTopK(e).cache()
    // exactly k results per query, ranked contiguously
    assert(sq8.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    // int8 at 64 dims barely perturbs cosine order: a 20-candidate rerank
    // must recover (nearly) all of the true top-5 — below 80% means the
    // quantized candidate scan is broken, not merely lossy
    val n = brute.count()
    val hits = sq8.join(brute, Seq("query_id", "neighbor_id")).count()
    assert(hits * 10 >= n * 8, s"SQ8 recall $hits/$n below 0.8")
    // the exact rerank score equals n1's score for every recovered pair
    val exact = AnnOps.cosineTopK(e)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    assert(sq8.join(exact, Seq("query_id", "neighbor_id"))
      .filter(col("sim") =!= col("bsim")).count() === 0)
    sq8.unpersist()
  }

  test("semDedup at the production threshold is drop-free on the fixture corpus") {
    val e = Tables.table(spark, sf, "embeddings")
    val out = AnnOps.semDedup(e) // τ = 0.95; within-cell sims top out ≈ 0.47
    assert(out.count() === e.count())
    assert(out.filter(!col("keep")).count() === 0)
    // the gated face (τ = 0.35) must actually exercise the drop rule
    val gated = AnnOps.semDedup(e, threshold = 0.35)
    assert(gated.filter(!col("keep")).count() > 0,
      "τ=0.35 face found no drops — the oracle would pass vacuously")
  }

  test("n13 MMR: planted near-duplicate is displaced by the diverse doc at pick 2") {
    import spark.implicits._
    // query 0 along e1, equally-relevant docs on BOTH sides of the axis:
    // 100 = (.8,.6) and its near-twin 101 = (.8,.601); 102 = (.8,−.6) the
    // mirror (same .8 relevance, pair-sim to 100 only .28); 103 orthogonal.
    // Plain top-k ranks the twin second (sim .7995); MMR must demote it:
    // twin .7·.7995 − .3·1.0 = .2597 < mirror .7·.8 − .3·.28 = .476 —
    // a twin of the pick can never beat an equally-relevant diverse doc.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val e = Seq(
      (0L, v(1, 0, 0, 0)),            // query
      (100L, v(0.8, 0.6, 0, 0)),      // pick 1 (sim .8, ties to min id)
      (101L, v(0.8, 0.601, 0, 0)),    // its near-duplicate twin
      (102L, v(0.8, -0.6, 0, 0)),     // the equally-relevant mirror
      (103L, v(0, 0, 0, 1)))          // padding
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val got = AnnOps.mmrTopK(e, k = 3, pool = 4)
      .filter(col("query_id") === 0)
      .orderBy("pick").collect()
      .map(r => r.getLong(r.fieldIndex("pick")) ->
        r.getLong(r.fieldIndex("neighbor_id"))).toMap
    assert(got(1L) === 100L, s"pick 1 must be the plain top-1: $got")
    assert(got(2L) === 102L, s"MMR must pick the diverse doc second: $got")
    assert(got(3L) === 101L, s"the twin returns once redundancy is priced: $got")
    // invariants on the fixture corpus: picks are distinct, pool-bounded,
    // and pick 1 is exactly n1's rank 1 per query
    val emb = Tables.table(spark, sf, "embeddings")
    val mmr = AnnOps.mmrTopK(emb)
    assert(mmr.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    assert(mmr.select("query_id", "neighbor_id").distinct().count() === mmr.count())
    val firsts = mmr.filter(col("pick") === 1)
      .select(col("query_id"), col("neighbor_id").as("m1"))
    val brute1 = AnnOps.cosineTopK(emb).filter(col("rnk") === 1)
      .select(col("query_id"), col("neighbor_id").as("b1"))
    assert(firsts.join(brute1, Seq("query_id"))
      .filter(col("m1") =!= col("b1")).count() === 0)
  }

  test("n14 kNN join: complete bounded graph, n1-exact sims, exhaustive at full probes") {
    val e = Tables.table(spark, sf, "embeddings")
    val g = AnnOps.knnJoin(e).cache()
    val n = e.count()
    // every vector gets a neighbor list of exactly k (500 vectors, 10
    // cells: each probed cell holds ~50 members, far above k)
    assert(g.select("vec_id").distinct().count() === n)
    assert(g.groupBy("vec_id").count().filter(col("count") =!= 5).count() === 0)
    // no self edges, no duplicate edges (one geometric cell per member)
    assert(g.filter(col("vec_id") === col("neighbor_id")).count() === 0)
    assert(g.select("vec_id", "neighbor_id").distinct().count() === g.count())
    // every edge carries n1's exact 4-dp cosine: any pair shared with the
    // brute-force graph must agree bit-for-bit
    val brute = AnnOps.searchTopK(e,
        e.select(col("vec_id").as("query_id"), col("embedding").as("qe")), 5)
      .select(col("query_id").as("vec_id"), col("neighbor_id"),
        col("rnk").as("brnk"), col("sim").as("bsim"))
    val shared = g.join(brute, Seq("vec_id", "neighbor_id")).cache()
    assert(shared.filter(col("sim") =!= col("bsim")).count() === 0,
      "kNN-join sim drifted from the brute-force contract")
    // 3-probe recall against the exact graph (own cell is probe 1, so the
    // near neighborhood is mostly local; generous margin for the fixture)
    val truth = brute.count()
    assert(truth === n * 5)
    assert(shared.count() * 2 >= truth,
      s"3-probe kNN-graph recall ${shared.count()}/$truth")
    // probing every cell makes the candidate pass exhaustive: the graph is
    // EXACTLY the brute-force graph, ranks included
    val nCells = e.select("label").distinct().count().toInt
    val full = AnnOps.knnJoin(e, nProbe = nCells)
    assert(full.exceptAll(brute.select(col("vec_id"), col("neighbor_id"),
      col("brnk").as("rnk"), col("bsim").as("sim"))).count() === 0)
    assert(full.count() === truth)
  }

  test("dq9 density outliers: exact per-cell quota, lowest-density flagged, graph reuse") {
    val e = Tables.table(spark, sf, "embeddings")
    val got = AnnOps.knnDensityOutliers(e).cache()
    // one density row per vector
    assert(got.count() === e.count())
    assert(got.select("vec_id").distinct().count() === e.count())
    // exact integer quota per cell: flagged = ceil(n_c / 20)
    val quota = got.groupBy("cell")
      .agg(count(lit(1)).as("n_c"),
        sum(when(col("outlier"), 1L).otherwise(0L)).as("flagged"))
      .filter(col("flagged") =!= floor((col("n_c") + 19) / lit(20)).cast("long"))
    assert(quota.count() === 0, "per-cell outlier quota drifted")
    // flagged vectors are their cell's LOWEST densities: every outlier's
    // density <= every inlier's density within the same cell
    val bad = got.filter(col("outlier"))
      .groupBy("cell").agg(max(col("density")).as("omax"))
      .join(got.filter(!col("outlier"))
        .groupBy("cell").agg(min(col("density")).as("imin")), Seq("cell"))
      .filter(col("omax") > col("imin"))
    assert(bad.count() === 0, "an outlier out-densified an inlier in its cell")
    // the kNN graph is memo-shared: a second derivation over the same
    // corpus re-runs NO graph construction (the n14 build-once contract)
    val before = ClusterMemo.computeCount
    val again = AnnOps.knnDensityOutliers(e)
    assert(again.exceptAll(got).count() === 0)
    assert(ClusterMemo.computeCount === before,
      "dq9 re-built the kNN graph instead of serving the session memo")
  }
}
