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
}
