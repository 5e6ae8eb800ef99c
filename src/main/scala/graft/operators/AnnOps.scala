package graft.operators

import graft.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float] column, 64-dim).
  *
  * Scale notes: brute force broadcasts the (small) query set so the corpus
  * side streams through map-side with zero shuffle — at 100 TB the cost is one
  * corpus scan per query batch. The IVF variant prunes the corpus by cluster
  * id (the `label` column models a coarse-quantizer assignment): the join key
  * turns top-k into per-cell work, the standard inverted-file layout. Dot
  * products use `zip_with`+`aggregate` in double precision — codegen'd, no
  * UDF, deterministic left-to-right summation.
  */
object AnnOps {
  /** Sequential left-to-right double dot product of two float arrays —
    * the native codegen'd expression [[graft.functions.DotProductF]] (bit-
    * identical to the `aggregate(zip_with(...))` fold it replaces, without
    * per-element lambda dispatch).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_f(a, b)

  private def norm(a: Column): Column =
    graft.functions.VectorFunctions.norm_f(a)

  /** Cosine similarity with PRE-COMPUTED norms, quantized to 4 dp via
    * floor(x*1e4 + 0.5)/1e4 — bit-deterministic in both engines (unlike
    * round(), whose HALF_UP on the shortest decimal string diverges from
    * value-based rounding) and absorbs sub-ulp summation-order jitter.
    *
    * Why the norms are arguments instead of `norm(a) * norm(b)` inline: the
    * inline form costs THREE 64-dim dot products per candidate pair; norms
    * are per-VECTOR quantities, so each join side computes its norm once in
    * a projection below the join and the per-pair cost drops to one dot.
    * Catalyst never merges a below-join Project into the pair-side
    * projection, so the caching survives optimization.
    */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    floor(dot(a, b) / (na * nb) * 10000.0 + 0.5) / 10000.0

  /** Two-phase top-k per query: per-partition local top-k, then merge the
    * bounded local lists. A `Window.partitionBy(query_id)` would pull EVERY
    * (query, candidate) similarity onto one task per query — a single-reducer
    * bottleneck at corpus scale; here the shuffle carries at most
    * k·numPartitions rows per query. Ordering: sim desc, neighbor_id asc
    * (ascending sort on struct(-sim, neighbor_id)).
    */
  private def topKPerQuery(sims: DataFrame, k: Int, keyCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    val item = struct((-col("sim")).as("negsim"), col("neighbor_id"), col("sim"))
    def localTopK(df: DataFrame, grp: Seq[Column]) =
      df.groupBy(grp: _*)
        .agg(slice(array_sort(collect_list(item)), 1, k).as("top"))
        .select(grp :+ explode(col("top")).as("it"): _*)
        .select(grp ++ Seq(col("it.neighbor_id"), col("it.sim"), col("it.negsim")): _*)
    val local = localTopK(sims.withColumn("_p", spark_partition_id()), key :+ col("_p"))
    localTopK(local, key)
      .groupBy(key: _*)
      .agg(posexplode(slice(array_sort(collect_list(item)), 1, k)).as(Seq("i", "it")))
      .select(key ++ Seq(col("it.neighbor_id").as("neighbor_id"),
        (col("i") + 1).cast("long").as("rnk"), col("it.sim").as("sim")): _*)
  }

  /** N1 — brute-force cosine top-k: the exact baseline. Queries = vec_id < 10,
    * k = 5, self-pairs excluded; ties broken by neighbor id.
    */
  def cosineTopK(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq"))
    val corpus = e.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nv")) // norm once per vector, below the join
    val sims = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    topKPerQuery(sims, 5, Seq("query_id"))
      .select("query_id", "neighbor_id", "rnk", "sim")
  }
  def cosineTopK(spark: SparkSession, dir: String): DataFrame =
    cosineTopK(table(spark, dir, "embeddings"))

  /** N2 — IVF-style ANN: probe only the query's cell (`label` = coarse
    * centroid assignment), top-3 per query. The scale path: corpus partitioned
    * by cell, per-cell scans instead of full scans.
    */
  def ivfTopK(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("label"), norm(col("embedding")).as("nq"))
    val corpus = e.select(col("label"), col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nv"))
    val sims = corpus.join(broadcast(q), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("label").as("cell"), col("vec_id").as("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    topKPerQuery(sims, 3, Seq("query_id", "cell"))
      .select("query_id", "cell", "neighbor_id", "rnk", "sim")
  }
  def ivfTopK(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(table(spark, dir, "embeddings"))

  /** D6 — embedding-cosine near-dup detection, the vector-space member of the
    * dedup family (exact/MinHash/SimHash/n-gram live in [[DedupOps]]): every
    * vector gets its nearest neighbor WITHIN ITS IVF CELL (`label` = coarse
    * quantizer output, as in [[ivfTopK]]) and an `is_dup` flag at
    * `threshold`. Bucketing-by-cell is the standard scale path for embedding
    * dedup — candidate pairs are bounded by cell population, never the n²
    * corpus, exactly like d3's LSH band buckets; the top-1 reduction uses the
    * two-phase partial top-k, so no per-vector single-reducer window. Drop
    * rows where `is_dup && vec_id > nn_id` for greedy keep-first removal.
    */
  def embeddingNearDups(e: DataFrame, threshold: Double = 0.95): DataFrame = {
    val left = e.select(col("label"), col("vec_id"), col("embedding").as("ea"),
      norm(col("embedding")).as("na"))
    val right = e.select(col("label"), col("vec_id").as("neighbor_id"),
      col("embedding").as("eb"), norm(col("embedding")).as("nb"))
    val sims = left.join(right, Seq("label"))
      .filter(col("neighbor_id") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("sim"))
    topKPerQuery(sims, 1, Seq("vec_id"))
      .select(col("vec_id"), col("neighbor_id").as("nn_id"), col("sim"),
        (col("sim") >= threshold).as("is_dup"))
  }
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDups(table(spark, dir, "embeddings"))

  /** Coarse-quantizer training: centroid = element-wise mean vector per
    * cluster. One shuffle on (cell, dim) — dimension count is a constant, so
    * this scales as a plain aggregation of the corpus.
    */
  def centroids(e: DataFrame, cellCol: String): DataFrame =
    e.select(col(cellCol).as("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cell", "dim")
      .agg(avg(col("v")).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell"),
        transform(col("dm"), x => x.getField("m").cast("float")).as("centroid"))

  /** IVF cell assignment: nearest centroid in euclidean distance over the
    * broadcast centroid table — the real quantization step (ivfTopK's `label`
    * column models its output). argmin ‖x−c‖² = argmax (2·x·c − ‖c‖²), so one
    * native dot product per (vector, centroid). Corpus side is map-only:
    * broadcast join + max_by.
    */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame =
    e.join(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        (dot(col("embedding"), col("centroid")) * 2.0 -
          dot(col("centroid"), col("centroid"))).as("score"))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), struct(col("score"), -col("cell"))).as("assigned_cell"))

  /** Full IVF search: corpus pre-assigned to cells, each query probes its
    * `nProbe` nearest cells and ranks candidates by exact cosine — the
    * standard recall/throughput dial (nProbe = all cells ⇒ exact brute
    * force). The query side is small, so probe selection is a local sort; the
    * corpus side touches only the probed cells via the equi-join on cell.
    */
  def ivfSearch(corpus: DataFrame, cents: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val assigned = corpus.join(
      assignCells(corpus, cents).withColumnRenamed("assigned_cell", "cell"), Seq("vec_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq"))
      .join(broadcast(cents))
      .select(col("query_id"), col("qe"), col("nq"), col("cell"),
        (dot(col("qe"), col("centroid")) * 2.0 -
          dot(col("centroid"), col("centroid"))).as("score"))
      .withColumn("pr", expr(s"row_number() over (partition by query_id order by score desc, cell)"))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qe", "nq", "cell")
    val sims = assigned
      .withColumn("nv", norm(col("embedding")))
      .join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    topKPerQuery(sims, k, Seq("query_id"))
  }
}
