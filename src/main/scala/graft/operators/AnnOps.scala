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
  /** The n10/n13/c5 serving defaults, shared BY NAME with the DuckDB oracle
    * SQL (SparkEntry's `ivfSq8Rer`/`mmrGreedyTail`/`c5Sql` interpolate these
    * same constants) — a default change here reaches operator and oracle
    * together instead of silently diverging until the next correctness run.
    * λ and μ are INDEPENDENT (μ ≠ 1−λ: binary 1−0.7 is 0.30000000000000004
    * and engines would quantize differently near ties).
    */
  val ServeK = 5
  val ServePool = 20
  val ServeNProbe = 3
  val MmrLambda = 0.7
  val MmrMu = 0.3
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

  /** The n1 scoring core over an ARBITRARY corpus/query split: each query
    * (`query_id`, `qe`) scored against every corpus vector except itself,
    * exact 4-dp-quantized cosine, two-phase top-k, ties by neighbor id.
    * n1 rides this verbatim; [[graft.streaming.StatsStreams.vectorSearchStream]]
    * applies it per micro-batch so the streaming contract cannot drift.
    *
    * Scale notes (100 TB): the query side BROADCASTS (standing queries are
    * report-sized); the corpus is scored map-side in one pass with no
    * corpus shuffle — the top-k merge moves ≤ k·partitions rows per query.
    */
  def searchTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKPerQuery(scoredPairs(corpus, queries), k, Seq("query_id"))
      .select("query_id", "neighbor_id", "rnk", "sim")

  /** The n1 SCORING stage alone — every (query, corpus vector) pair's exact
    * 4-dp cosine with self-pairs excluded, as `(query_id, neighbor_id,
    * sim)`. Stateless and aggregation-free (broadcast queries, map-side
    * projection), so the SAME definition scores a `readStream` frame — the
    * keyed streaming face ([[graft.streaming.StatsStreams
    * .vectorSearchStream]]) consumes it directly, which is what keeps the
    * stream's similarity contract bit-identical to [[searchTopK]]'s.
    */
  private[graft] def scoredPairs(corpus: DataFrame, queries: DataFrame): DataFrame = {
    val q = queries.select(col("query_id"), col("qe"), norm(col("qe")).as("nq"))
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nv")) // norm once per vector, below the join
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
  }

  /** N1 — brute-force cosine top-k: the exact baseline. Queries = vec_id < 10,
    * k = 5, self-pairs excluded; ties broken by neighbor id.
    */
  def cosineTopK(e: DataFrame): DataFrame =
    searchTopK(e, e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe")), 5)
  def cosineTopK(spark: SparkSession, dir: String): DataFrame =
    cosineTopK(table(spark, dir, "embeddings"))

  /** N8 — FILTERED vector search: each query's top-k cosine neighbors
    * restricted to corpus vectors sharing the query's label — the
    * metadata-filtered ANN shape every production vector store exposes
    * (tenant / language / source scoping). Same exact ordering contract as
    * n1 (4-dp-quantized sim DESC, neighbor_id).
    *
    * Scale notes (100 TB): the filter is applied BEFORE similarity — the
    * label equality turns n1's broadcast nested-loop into a label-KEYED
    * broadcast hash join, so each corpus vector is scored only against the
    * queries of its own label partition (filter-then-score, not
    * score-then-filter: candidates shrink by the label selectivity, here
    * 10×). Top-k is the same two-phase partial merge as n1; an IVF variant
    * composes by filtering within probed cells.
    */
  def filteredTopK(e: DataFrame, k: Int = 5): DataFrame = {
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq"), col("label").as("qlabel"))
    val corpus = e.select(col("vec_id"), col("embedding"), col("label"),
      norm(col("embedding")).as("nv"))
    val sims = corpus.join(broadcast(q),
        corpus("label") === q("qlabel") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    topKPerQuery(sims, k, Seq("query_id"))
      .select("query_id", "neighbor_id", "rnk", "sim")
  }
  def filteredTopK(spark: SparkSession, dir: String): DataFrame =
    filteredTopK(table(spark, dir, "embeddings"))

  /** N7 — k-NN weak labeling (auto-labeling / label propagation, the
    * nearest-neighbor classifier the data-curation literature uses to
    * extend a small labeled seed over an unlabeled corpus): each query
    * vector takes the majority label of its top-k cosine neighbors.
    * Deterministic everywhere: neighbors tie-break (sim DESC, neighbor_id)
    * on the 4-dp-quantized similarity — n1's exact ordering — and the vote
    * tie-breaks (votes DESC, label). `agrees` compares the vote against
    * the vector's own stored label — the held-out-accuracy face.
    *
    * Scale notes (100 TB): the query batch broadcasts (n1's shape — the
    * corpus streams map-side, zero corpus shuffle), top-k is the two-phase
    * partial top-k, and the vote runs over queries×k rows — trivially
    * small; the label join-backs are broadcast. A production variant swaps
    * the brute-force candidate stage for IVF/PQ (n2/n6) with the same
    * vote.
    */
  def knnLabel(e: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq"))
    val corpus = e.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nv"))
    val sims = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    val labels = e.select(col("vec_id"), col("label"))
    val votes = topKPerQuery(sims, k, Seq("query_id"))
      .join(broadcast(labels.withColumnRenamed("vec_id", "neighbor_id")),
        Seq("neighbor_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .join(broadcast(labels.select(col("vec_id").as("query_id"),
        col("label").as("true_label"))), Seq("query_id"))
      .select(col("query_id"), col("true_label"),
        col("label").as("predicted_label"), col("votes"),
        (col("label") === col("true_label")).as("agrees"))
  }
  def knnLabel(spark: SparkSession, dir: String): DataFrame =
    knnLabel(table(spark, dir, "embeddings"))

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
    *
    * Ordering note for a 100 TB pipeline: run EXACT dedup (d1) before this
    * stage. Heavy verbatim duplication inflates cells (identical vectors
    * co-assign), and the within-cell pair join grows with cell-population² —
    * the 3x-replica scaling check measures exactly that square (9x shuffle
    * at 3x data). With exact dups removed first, cell sizes track the
    * k-means balance and the join stays linear-ish, which is how c2 orders
    * its stages.
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

  /** Corpus-level embedding near-dup REMOVAL — the vector-space analog of
    * [[DedupOps.dropNearDuplicates]]: drop every vector whose within-cell
    * nearest neighbor is ≥ `threshold` similar and has a lower id (greedy
    * keep-first). One anti-join over the candidate-bounded d6 pairs.
    */
  def dropEmbeddingNearDups(e: DataFrame, threshold: Double = 0.95): DataFrame = {
    val losers = embeddingNearDups(e, threshold)
      .filter(col("is_dup") && col("vec_id") > col("nn_id"))
      .select(col("vec_id"))
      .distinct()
    e.join(losers, Seq("vec_id"), "left_anti")
  }

  // ---- Random-hyperplane (SRP) LSH -----------------------------------------

  private val LshPlanes = 32
  private val LshBands = 4 // 8 bits per band → 256 buckets per band
  private val LshDims = 64

  /** Deterministic Rademacher hyperplanes for sign-random-projection LSH:
    * entry (p, d) = +1 if the first hex nibble of md5("p_d") < 8, else −1.
    * Charikar's SRP scheme (STOC'02) with ±1 entries — E[sign agreement] =
    * 1 − θ/π, same guarantee as Gaussian planes. Deriving the matrix from md5
    * makes it a reproducible constant everywhere (any executor, any engine:
    * the DuckDB oracle embeds the same values as literals), with no
    * driver-side RNG state to ship.
    */
  def hyperplanes(nPlanes: Int = LshPlanes, dims: Int = LshDims): Array[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dims) { d =>
        md.reset()
        val h = md.digest(s"${p}_${d}".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xF) < 8) 1.0f else -1.0f
      }
    }
  }

  /** Bit p of the LSH signature = sign of the projection onto plane p,
    * as '1'/'0' chars concatenated into a bit string. The projection is
    * 4-dp-quantized before the sign test so the bit is stable against
    * sub-ulp cross-engine summation jitter (same trick as [[cosinePre]]).
    * Pure map-side, ONE native-expression call for all 32 bits
    * ([[graft.functions.SrpSig]] — the composed 32-literal-dot-product
    * projection cost ~5s of janino compile cold).
    */
  private[graft] def lshSignature(emb: Column): Column =
    graft.functions.SrpSig(emb, LshPlanes)

  /** N3 — LSH-bucketed ANN (the data-INDEPENDENT scale path, complementing
    * IVF which needs a centroid training pass): queries = vec_id < 20, k = 5.
    *
    * Plan shape at 100 TB: signatures are map-side (32 dots/vector); the
    * exploded query bands are broadcast, so the corpus is NEVER shuffled —
    * candidates fall out of a map-side broadcast hash join on (band, key).
    * Similarity is computed right there (the norm is precomputed per vector
    * below the join), and only (query_id, neighbor_id, sim) triples — never
    * embeddings — reach the one narrow shuffle that dedups pairs matching in
    * multiple bands. Recall dials with planes/bands (32/4 → 8-bit bands);
    * a missed true neighbor is the accepted ANN trade, and the oracle mirrors
    * the same algorithm so the contract is exact.
    */
  def lshTopK(e: DataFrame, k: Int = 5): DataFrame =
    lshSearch(e, e.filter(col("vec_id") < 20), k)
  def lshTopK(spark: SparkSession, dir: String): DataFrame =
    lshTopK(table(spark, dir, "embeddings"))

  /** Full SRP-LSH search over arbitrary corpus/query frames — the general
    * API behind [[lshTopK]], parallel to [[ivfSearch]]. Self-pairs (shared
    * `vec_id`) are excluded.
    */
  def lshSearch(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val width = LshPlanes / LshBands
    def withBands(df: DataFrame, keep: Seq[Column]): DataFrame = {
      val keys = (0 until LshBands).map(b => substring(col("_sig"), 1 + width * b, width))
      df.withColumn("_sig", lshSignature(col("embedding")))
        .select(keep :+ posexplode(array(keys: _*)).as(Seq("band", "bkey")): _*)
    }
    val q = withBands(queries,
      Seq(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq")))
    val c = withBands(corpus,
      Seq(col("vec_id"), col("embedding"), norm(col("embedding")).as("nv")))
    val sims = c.join(broadcast(q), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
      .groupBy("query_id", "neighbor_id") // a pair can match in up to 4 bands
      .agg(max(col("sim")).as("sim"))
    topKPerQuery(sims, k, Seq("query_id"))
      .select("query_id", "neighbor_id", "rnk", "sim")
  }

  /** N4 — int8 embedding quantization accounting, the storage-side member of
    * the embedding family: per vector, symmetric max-abs scaling to
    * [−127, 127] (`q_i = floor(x_i·127/‖x‖∞ + 0.5)`, the standard int8
    * PTQ scheme) with integer summaries — quantized sum, L1 mass, saturated
    * and zeroed lane counts — that pin the arithmetic bit-for-bit against
    * the oracle without hashing float arrays. Pure scan-project: higher-order
    * array ops per row, no shuffle, no UDF.
    */
  def quantizeStats(e: DataFrame): DataFrame = {
    val ee = transform(col("embedding"), x => x.cast("double"))
    e.select(col("vec_id"), ee.as("ee"))
      .withColumn("scale", array_max(transform(col("ee"), x => abs(x))))
      .withColumn("qv", transform(col("ee"), x =>
        when(col("scale") > 0, floor(x * 127.0 / col("scale") + 0.5))
          .otherwise(0L)))
      .select(col("vec_id"), col("scale"),
        aggregate(col("qv"), lit(0L), (a, x) => a + x).as("qsum"),
        aggregate(col("qv"), lit(0L), (a, x) => a + abs(x)).as("qabs"),
        size(filter(col("qv"), x => abs(x) === 127)).cast("long").as("n_sat"),
        size(filter(col("qv"), x => x === 0)).cast("long").as("n_zero"))
  }
  def quantizeStats(spark: SparkSession, dir: String): DataFrame =
    quantizeStats(table(spark, dir, "embeddings"))

  /** N9 — int8-QUANTIZED search with exact rerank, the SQ8 retrieval shape
    * (FAISS `SQ8`, the standard memory/recall trade): the corpus is scanned
    * as n4's symmetric int8 codes (4× smaller than float32 — at 100 TB of
    * embeddings, the difference between a scan that fits page cache and one
    * that doesn't), candidates are ranked by the cosine OF THE QUANTIZED
    * vectors — the per-vector scales cancel in cosine, so the score derives
    * ENTIRELY from integer dot products (exact below 2^53; one sqrt + one
    * divide, 4-dp-quantized → bit-identical in both engines, no float
    * vector math on the wide scan) — and only the top-`cand` survivors per
    * query touch float embeddings for the exact n1-contract rerank.
    * Output carries both scores, so quantization error is visible inline.
    *
    * Scale notes (100 TB): the candidate pass is the n1 broadcast shape
    * over int8 codes (map-only, two-phase top-cand — never a per-query
    * single-reducer window); the rerank joins the CANDIDATE list
    * (queries × cand rows, broadcast) back to the float column, so full-
    * precision vectors are read for ~cand·|Q| rows only. A production
    * variant composes with IVF cells (n2) the same way.
    */
  def quantizedTopK(e: DataFrame, k: Int = 5, cand: Int = 20): DataFrame = {
    val ee = transform(col("embedding"), x => x.cast("double"))
    val qz = e.select(col("vec_id"), col("embedding"), ee.as("ee"))
      .withColumn("scale", array_max(transform(col("ee"), x => abs(x))))
      .withColumn("qv", transform(col("ee"), x =>
        when(col("scale") > 0, floor(x * 127.0 / col("scale") + 0.5))
          .otherwise(lit(0L))).cast("array<bigint>"))
      .withColumn("qn",
        graft.functions.VectorFunctions.dot_l(col("qv"), col("qv")))
    val queries = qz.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"),
        col("qn").as("qqn"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq"))
    val corpus = qz.select(col("vec_id"), col("qv"), col("qn"))
    // native codegen'd long dot — bit-identical to the zip_with fold it
    // replaces (integer adds are order-free and exact below 2^53)
    val idot = graft.functions.VectorFunctions.dot_l(col("qq"), col("qv"))
    val approx = when(col("qqn") === 0 || col("qn") === 0, lit(0.0)).otherwise(
      floor(idot.cast("double") / sqrt((col("qqn") * col("qn")).cast("double"))
        * 10000.0 + 0.5) / 10000.0)
    val cands = corpus
      .crossJoin(broadcast(queries.select(col("query_id"), col("qq"), col("qqn"))))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), approx.as("sim"))
    // |Q|*cand rows, but the lineage is the whole candidate scan and `top`
    // feeds TWO broadcast branches (rerank probe + final score-join), which
    // cannot share subtrees - unmaterialized the candidate pass ran twice
    // (r14). localCheckpoint over cache: the checkpoint stores the
    // AQE-coalesced layout, so the two broadcast collects don't each pay a
    // 32-task stage over a |Q|*cand frame
    val top = topKPerQuery(cands, cand, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("sim").as("approx_sim"))
      .localCheckpoint()
    val rer = e.select(col("vec_id").as("neighbor_id"), col("embedding"),
        norm(col("embedding")).as("nv"))
      .join(broadcast(top.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("query_id"), col("qe"), col("nq"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    topKPerQuery(rer, k, Seq("query_id"))
      .join(broadcast(top), Seq("query_id", "neighbor_id"))
      .select("query_id", "neighbor_id", "rnk", "sim", "approx_sim")
  }
  def quantizedTopK(spark: SparkSession, dir: String): DataFrame =
    quantizedTopK(table(spark, dir, "embeddings"))

  /** N10 — PROBE-BOUNDED quantized search: IVF cell probing (n2's shape)
    * composed with the SQ8 int8 candidate scan + exact rerank (n9's shape).
    * n9 alone is honest but scans the WHOLE int8 corpus per query — correct,
    * linear, and still a full-corpus read at 100 TB. Here the int8 scan
    * touches only the members of each query's `nProbe` nearest cells, so the
    * candidate row count is bounded by the probed fraction of the corpus —
    * the standard IVF×SQ composition (FAISS `IVFx,SQ8`).
    *
    * Determinism across engines: cell centroids are SEEDED from the
    * fixture's `label` groups via the 6-dp exact-mean convention n6's
    * codebooks use (integer 1e6-scaled sums — order-free — then ONE
    * divide+floor); every vector is then geometrically REASSIGNED to its
    * nearest centroid (one deterministic Lloyd assignment half-step — the
    * labels alone are a weak quantizer, measured below); assignment and
    * probe scores (argmin L2 ⇔ argmax 2·q·c − ‖c‖²) are 4-dp-quantized
    * BEFORE ranking so sub-ulp fold jitter can't flip a choice; candidate
    * scores are pure integer dot products (exact below 2^53); the rerank is
    * the n1 float contract. Every stage is therefore oracle-stateable —
    * unlike n2b, whose iterative Lloyd's TRAINING is not.
    *
    * Scale notes (100 TB): centroid derivation is one (cell, dim) shuffle of
    * the corpus — paid at INDEX time, amortized across queries (a real
    * deployment persists the codebook with the index; the one-lineage form
    * here is the self-contained oracle query). The codebook collects to the
    * driver (cells × dims doubles, the IVF/PQ codebook pattern), so cell
    * assignment is a LITERAL per-row argmax — no join, no corpus shuffle,
    * streaming-safe (the assignCellsLit contract). The search: probes are
    * a literal per-query argsort; the candidate scan is an equi-join on
    * `cell` against broadcast probes — reading int8 codes only (4× less
    * I/O than float), never a corpus shuffle and never a full scan; the
    * rerank touches float vectors for ≤ cand·|Q| rows. The plan contract
    * (PlanContractSpec) pins the broadcast + no-cartesian shape.
    */
  def ivfQuantizedTopK(e: DataFrame, k: Int = ServeK, cand: Int = ServePool,
      nProbe: Int = ServeNProbe): DataFrame = {
    val centArr = seededCentroids(e)
    require(centArr.nonEmpty, "ivfQuantizedTopK needs at least one cell")
    val scoredCells = cellScores(centArr)
    // GEOMETRIC cell membership: every vector reassigned to its nearest
    // seeded centroid (one deterministic Lloyd assignment half-step). The
    // fixture labels alone are a weak quantizer — measured 3-probe recall
    // 0.38 ≈ the probed fraction; reassignment aligns membership with the
    // metric and lifts it to 0.56 at the same probe budget (sf0.1,
    // spec-pinned ≥ 0.5 in AnnOpsSpec and recall_ok in the bench record).
    val ee = transform(col("embedding"), x => x.cast("double"))
    // the IVF×SQ8 INDEX: every vector's geometric cell + int8 codes + code
    // norm. Consumed three times per search (queries, probes, candidates)
    // and by every search over the same corpus, so it checkpoints eagerly
    // ONCE and the checkpoint is MEMOIZED per (session, corpus) — the
    // build-once/serve-many serving shape (a deployment persists exactly
    // this frame; ClusterMemo recomputes if a sweep dropped the blocks)
    val qz = ClusterMemo.getOrCompute(TrainMemo.key(e, "n10:qz")) {
      e.select(col("vec_id"), col("embedding"), ee.as("ee"),
          array_max(scoredCells).getField("cell").as("cell"))
        .withColumn("scale", array_max(transform(col("ee"), x => abs(x))))
        .withColumn("qv", transform(col("ee"), x =>
          when(col("scale") > 0, floor(x * 127.0 / col("scale") + 0.5))
            .otherwise(lit(0L))).cast("array<bigint>"))
        .withColumn("qn",
          graft.functions.VectorFunctions.dot_l(col("qv"), col("qv")))
        .select(col("vec_id"), col("embedding"), col("cell"), col("qv"),
          col("qn"))
        .localCheckpoint(true)
    }
    val queries = qz.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"),
        col("qn").as("qqn"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq"))
    // probe selection: nProbe best cells by the same literal scores —
    // descending sort on (sc, negcell) keeps the min-cell tie-break
    val probes = qz.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        explode(slice(reverse(array_sort(scoredCells)), 1, nProbe)).as("pc"))
      .select(col("query_id"), col("pc.cell").as("cell"))
    // int8 candidate scan over probed cells only — integer dots, exact
    val qside = probes.join(
      broadcast(queries.select(col("query_id"), col("qq"), col("qqn"))),
      Seq("query_id"))
    // native codegen'd long dot — bit-identical to the zip_with fold
    val idot = graft.functions.VectorFunctions.dot_l(col("qq"), col("qv"))
    val approx = when(col("qqn") === 0 || col("qn") === 0, lit(0.0)).otherwise(
      floor(idot.cast("double") / sqrt((col("qqn") * col("qn")).cast("double"))
        * 10000.0 + 0.5) / 10000.0)
    val cands = qz.select(col("cell"), col("vec_id"), col("qv"), col("qn"))
      .join(broadcast(qside), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        approx.as("sim"))
    val top = topKPerQuery(cands, cand, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("sim").as("approx_sim"))
    // exact rerank — identical tail to quantizedTopK (the n1 contract)
    val rer = e.select(col("vec_id").as("neighbor_id"), col("embedding"),
        norm(col("embedding")).as("nv"))
      .join(broadcast(top.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("query_id"), col("qe"), col("nq"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    topKPerQuery(rer, k, Seq("query_id"))
      .join(broadcast(top), Seq("query_id", "neighbor_id"))
      .select("query_id", "neighbor_id", "rnk", "sim", "approx_sim")
  }
  def ivfQuantizedTopK(spark: SparkSession, dir: String): DataFrame =
    ivfQuantizedTopK(table(spark, dir, "embeddings"))

  /** The n10/n11 coarse ASSIGNMENT as a standalone face: every vector's
    * geometric cell under the memoized label-seeded centroids (the same
    * [[seededCentroids]] + 4-dp integer-score argmax n10's index uses, so
    * its consumers — s14's cluster-balanced sampler — ride the trained
    * quantizer the memo already holds). Map-only against driver-held
    * literals: no join, no corpus shuffle, streaming-safe (the
    * assignCellsLit contract), and oracle-stateable end-to-end (the
    * ivfSq8Rer prefix states it verbatim), unlike [[kmeansTrain]]'s
    * iterative loop.
    */
  def seededCellAssign(e: DataFrame): DataFrame = {
    val centArr = seededCentroids(e)
    require(centArr.nonEmpty, "seededCellAssign needs at least one cell")
    e.select(col("vec_id"),
      array_max(cellScores(centArr)).getField("cell").as("cell"))
  }

  /** N14 — kNN-GRAPH construction: every corpus vector's top-`k` cosine
    * neighbors, probe-bounded by the trained coarse quantizer. n1–n13
    * answer QUERY-side search (a handful of standing queries against the
    * corpus); the kNN JOIN is the INDEX-side primitive the LLM curation
    * stack builds on — SemDeDup clusters over it, label propagation and
    * graph dedup consume its edges, and dataset cartography reads its
    * neighborhood densities. Brute force is n²·dims (the one shape that
    * can never ship at 100 TB); here each vector is scored only against
    * the members of its `nProbe` nearest cells (NN-Descent/FAISS-style
    * blocked construction), so candidate pairs are Σ_cells |members_c| ×
    * |probers_c| — the probed fraction of n², never n².
    *
    * Determinism across engines (every stage oracle-stateable): cells and
    * probes are n10's contract verbatim — the memoized [[seededCentroids]]
    * quantizer, 4-dp-quantized integer cell scores, min-cell tie-breaks —
    * and the pair score is n1's exact 4-dp float cosine with ties to the
    * lower neighbor id. Probe 1 is the vector's own cell (assignment and
    * probe ranking share one score array), so the classic same-cell kNN
    * graph is the nProbe=1 special case.
    *
    * Scale notes (100 TB): the quantizer is TrainMemo-held (train once,
    * build many); cell assignment and probe selection are literal per-row
    * argmax/argsort — no join, no corpus shuffle. The single shuffle is the
    * equi-join on `cell`: the member side moves each vector once, the
    * probe side `nProbe` times — (1+nProbe)× the corpus, linear with a
    * small constant, and cell count grows with the corpus (k ∝ √n keeps
    * per-cell blocks bounded, AQE rebalances stragglers). Top-k is the
    * two-phase partial merge (≤ k·partitions rows per vector through the
    * final exchange — never the full candidate list).
    */
  def knnJoin(e: DataFrame, k: Int = ServeK, nProbe: Int = ServeNProbe): DataFrame =
    // the GRAPH is an index artifact: built once per (session, corpus,
    // params) and served to every consumer — the n14 gate, dq9's density
    // outliers; a 100 TB deployment persists it next to the index — with
    // ClusterMemo's sweep-safe eager-checkpoint lifecycle (recomputed if a
    // sweep dropped the blocks, never served stale across corpora)
    ClusterMemo.getOrCompute(TrainMemo.key(e, s"n14:knn:k=$k,p=$nProbe")) {
      knnJoinStage(e, k, nProbe).localCheckpoint(true)
    }
  def knnJoin(spark: SparkSession, dir: String): DataFrame =
    knnJoin(table(spark, dir, "embeddings"))

  /** The n14 construction PLAN itself (uncheckpointed) — what
    * PlanContractSpec pins; [[knnJoin]] wraps it in the session memo.
    */
  private[graft] def knnJoinStage(e: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val centArr = seededCentroids(e)
    require(centArr.nonEmpty, "knnJoin needs at least one cell")
    val scoredCells = cellScores(centArr)
    // probe side: every vector × its nProbe best cells (descending sort on
    // (sc, negcell) keeps the min-cell tie-break); norm computed ONCE below
    // the join (the cosinePre contract). SPREAD before the pair join: the
    // join's output expands by |cell| per probe row, so the probe side's
    // split count caps the whole construction — a compacted corpus arriving
    // as one parquet split would otherwise crunch every candidate pair in a
    // single task (measured: 10× corpus, one file → one 20-minute task; the
    // m2/t9 fan-out lesson applied to the blocked self-join)
    val probes = graft.Tables.spread(
      e.select(col("vec_id"), col("embedding"),
          norm(col("embedding")).as("nq"),
          explode(slice(reverse(array_sort(scoredCells)), 1, nProbe)).as("pc"))
        .select(col("vec_id"), col("embedding"), col("nq"),
          col("pc.cell").as("cell")))
    // member side: every vector filed under its ONE geometric cell, so each
    // (vector, neighbor) candidate pair arises at most once — no dedup stage
    val members = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), norm(col("embedding")).as("nn"),
        array_max(scoredCells).getField("cell").as("cell"))
    val cands = probes.join(members, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosinePre(col("embedding"), col("ne"), col("nq"), col("nn")).as("sim"))
    // top-k via rank window, NOT topKPerQuery's collect_list merge: with
    // |cell|-sized candidate lists per vector the object aggregate falls
    // back to sort-based mode and copies every pair row into per-group
    // buffers (measured 10×: 120M GenericInternalRow copies dominated the
    // build). The row_number ≤ k filter compiles to a partial
    // WindowGroupLimit (the g1/s6/d12 contract): each map split forwards
    // ≤ k binary rows per vector — bounded shuffle, zero object churn —
    // and the selection/order contract (sim DESC, neighbor_id) is
    // identical to topKPerQuery's
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("vec_id", "neighbor_id", "rnk", "sim")
  }

  /** DQ9 — kNN-DENSITY outliers: the embedding-space data-quality signal
    * (dataset cartography / mislabel-and-junk pruning). A vector whose k
    * nearest neighbors are all far away sits in a sparse region — OCR
    * garbage, wrong-language shards, adversarial spam — exactly what an
    * embedding-quality gate drops before training. Density = the DECIMAL
    * sum of the vector's [[knnJoin]] edge similarities (5 exact 4-dp
    * values, decimal-summed so no engine sees float accumulation order);
    * the outlier flag is the bottom 1/`frac` of each CELL by (density,
    * vec_id) — s13's exact integer quota (`rnk·frac ≤ n_c + frac−1`), per
    * cell rather than corpus-wide so a naturally diffuse topic is judged
    * against its own neighborhood, not a dense one's.
    *
    * Scale notes (100 TB): rides the memoized kNN graph (built once per
    * corpus, shared with n14) — the graph is n·k rows, so everything here
    * is post-index bookkeeping: one vec_id-keyed agg over n·k, one
    * broadcast-sized join to the literal cell assignment, one cell-keyed
    * exchange shared by the rank and count windows (the s14 contract
    * shape).
    */
  def knnDensityOutliers(e: DataFrame, k: Int = ServeK,
      nProbe: Int = ServeNProbe, frac: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cell").orderBy(col("density"), col("vec_id"))
    val cw = Window.partitionBy("cell")
    knnJoin(e, k, nProbe)
      .groupBy("vec_id")
      .agg(graft.Tables.dsum(col("sim")).as("density"))
      .join(seededCellAssign(e), Seq("vec_id"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_c", count(lit(1)).over(cw))
      .withColumn("outlier", col("rnk") * frac <= col("n_c") + (frac - 1))
      .select(col("vec_id"), col("cell"), col("density"), col("outlier"))
  }
  def knnDensityOutliers(spark: SparkSession, dir: String): DataFrame =
    knnDensityOutliers(table(spark, dir, "embeddings"))

  /** n10/n11's shared coarse quantizer: centroids SEEDED by the fixture's
    * label cells — n6's exact-mean pattern (per-dim integer 1e6 sums,
    * order-free, one divide + one floor), collected driver-side in ascending
    * cell order. The codebook is cells × dims doubles — the same bounded
    * collect as the IVF/PQ codebooks — so cell assignment and probe
    * selection run as literal per-row argmax/argsort inside one codegen'd
    * projection: zero joins, zero corpus shuffle (the assignCellsLit
    * contract).
    */
  private def seededCentroids(e: DataFrame): Array[(Int, Seq[Double])] =
    // trained once per (session, corpus) and served from TrainMemo: the
    // 100 TB serving shape — the coarse quantizer belongs to the INDEX, not
    // the query, so n10/n11/c5 sharing one corpus share one derivation
    TrainMemo.getOrCompute(TrainMemo.key(e, "seededCentroids")) {
      seededCentroidsCompute(e)
    }

  private def seededCentroidsCompute(e: DataFrame): Array[(Int, Seq[Double])] = {
    val cents = e
      .select(col("label").as("cell"),
        posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("dim", "v")))
      .withColumn("iv", floor(col("v") * 1000000.0 + 0.5).cast("long"))
      .groupBy("cell", "dim")
      .agg(sum(col("iv")).as("s"), count(lit(1)).as("n"))
      .withColumn("m",
        floor(col("s").cast("double") / col("n") + 0.5) / 1000000.0)
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell"), transform(col("dm"), x => x.getField("m")).as("centroid"))
    cents.collect().map { r =>
      (r.getAs[Number]("cell").intValue(), r.getSeq[Double](1))
    }.sortBy(_._1)
  }

  /** The 4-dp-quantized literal cell-score array over [[seededCentroids]]:
    * floor((2·v·c − ‖c‖²)·1e4 + 0.5) per cell — argmin L2 as an integer
    * score, so sub-ulp fold jitter cannot flip an assignment or a probe
    * choice (array_max picks the nearest cell, min-cell ties via negcell).
    * The float×double dot is the native codegen'd DotProductFD
    * (bit-identical to the lambda fold; centroids are DOUBLE — 6-dp means
    * are not float-representable — so dot_f cannot apply).
    */
  private def cellScores(centArr: Array[(Int, Seq[Double])]): Column = {
    def ddot(a: Column, b: Column): Column =
      graft.functions.VectorFunctions.dot_fd(a, b)
    array(centArr.map { case (cell, c) =>
      val cnorm2 = c.foldLeft(0.0)((a, x) => a + x * x)
      struct(
        floor((ddot(col("embedding"), typedlit(c)) * 2.0 - lit(cnorm2))
          * 10000.0 + 0.5).as("sc"),
        lit(-cell).as("negcell"), lit(cell).as("cell"))
    }.toIndexedSeq: _*)
  }

  /** N11 — IVFADC (Jégou, Douze, Schmid, TPAMI 2011 §V; FAISS `IVFx,PQy`):
    * the inverted-file coarse quantizer composed with RESIDUAL product
    * quantization. n6's ADC is exhaustive (every code scanned per query);
    * n10 probe-bounds an SQ8 scan but keeps whole-vector int8 codes
    * (64 bytes/vector). Here each vector's RESIDUAL from its coarse
    * centroid is PQ-encoded to `PqM` 4-bit codes (8 ints/vector — the 64×
    * compression), and per query only the `nProbe` nearest cells' postings
    * are ADC-scored with a per-(query, cell) residual distance table —
    * the composition that makes billion-scale search tractable: I/O follows
    * the probed fraction AND each candidate costs 8 table lookups, no
    * vector math.
    *
    * Determinism across engines (every stage oracle-stateable): coarse
    * centroids/assignment/probes are n10's 4-dp integer-score contract;
    * residuals are exact IEEE double subtractions (double-cast floats minus
    * 6-dp means); the residual codebook is point-seeded and refined by two
    * unrolled Lloyd rounds (see [[pqLloydCodebook]] — deterministic assign
    * + 6-dp integer-mean update); encode/dtable distances are 4-dp sq-L2
    * with ties to the lower code; ADC sums ride DECIMAL(18,4); the final
    * rerank is the n1 float contract.
    *
    * Scale notes (100 TB): centroid + codebook derivation are two keyed
    * aggregations of the corpus with map-side partials — INDEX-time costs,
    * amortized across queries (a deployment persists cells + codes).
    * Assignment, residuals, and encoding are map-only against driver-held
    * literals (no join, no corpus shuffle, streaming-safe). The search:
    * probes and distance tables are literal per-query work (≤ |Q|·nProbe
    * rows, broadcast); the candidate scan is an equi-join on `cell` against
    * the broadcast probe side reading the 8-int codes column only; the
    * rerank touches float vectors for ≤ cand·|Q| rows. PlanContractSpec
    * pins the broadcast + no-cartesian shape.
    */
  def ivfPqTopK(e: DataFrame, k: Int = 5, cand: Int = 150,
      nProbe: Int = 4): DataFrame = {
    val centArr = seededCentroids(e)
    require(centArr.nonEmpty, "ivfPqTopK needs at least one cell")
    val scoredCells = cellScores(centArr)
    val centMap = typedlit(centArr.toMap)
    val ee = transform(col("embedding"), x => x.cast("double"))
    // geometric cell membership (n10's reassignment half-step) + exact
    // double residual from the assigned centroid — one map-only projection
    // the (vec_id, cell, res) index frame is consumed three times (two
    // Lloyd rounds + the encode), so it checkpoints EAGERLY once — and the
    // CHECKPOINT IS MEMOIZED per (session, corpus): this frame IS the n11
    // index (a deployment persists exactly it), so repeated executions over
    // one corpus share one build instead of re-deriving it per query batch.
    // ClusterMemo's liveness tracking recomputes if a sweep dropped the
    // blocks; the map-only assignment contract is unchanged
    val asg = ClusterMemo.getOrCompute(TrainMemo.key(e, "n11:asg")) {
      e.select(col("vec_id"), col("embedding"), ee.as("ee"),
          array_max(scoredCells).getField("cell").as("cell"))
        .withColumn("res",
          zip_with(col("ee"), element_at(centMap, col("cell")), (x, c) => x - c))
        .select(col("vec_id"), col("cell"), col("res"))
        .localCheckpoint(true)
    }
    // residual PQ codebook: POINT-seeded (vec_id 0..15's residual
    // subvectors — k-means' "first k points" seeding, genuinely spread
    // unlike n6's seed-partition means, which collapse toward the global
    // residual mean and leave ADC unable to rank) + two unrolled Lloyd
    // rounds, each a deterministic assign (4-dp sq-L2, ties to lower j)
    // and 6-dp integer-mean update — the g7/g13 fixed-round convention,
    // so the oracle states the identical training prefix. Memo-keyed on
    // the RAW corpus plan (not the checkpointed asg, whose LogicalRDD
    // identity is unique per checkpoint): asg is a pure function of `e`,
    // so the key collides exactly when the training input does.
    val cb = TrainMemo.getOrCompute(TrainMemo.key(e, "n11:pqLloyd:2")) {
      pqLloydCodebook(asg.select(col("vec_id"), col("res")), rounds = 2)
    }
    // encode: nearest code per subspace by 4-dp sq-L2, ties to lower j —
    // the native one-pass PqEncodeExpr (bit-identical to the composed
    // array_min-over-scored-structs form, spec-pinned)
    val enc = asg.select(col("cell"), col("vec_id").as("neighbor_id"),
      graft.functions.PqFunctions.pq_encode(col("res"), cb, PqM, PqDims, PqK)
        .as("codes"))
    // probes: nProbe best cells per query by the same literal 4-dp scores;
    // the residual distance TABLE is per (query, probed cell) — the IVFADC
    // detail that distinguishes residual PQ from n6's global tables
    val dt = (0 until PqM).map { s =>
      val xs = slice(col("qres"), s * PqDims + 1, PqDims)
      transform(pqScoredCodes(xs, pqEntries(cb, s)), en => en.getField("dq"))
    }
    val qside = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), ee.as("qee"),
        explode(slice(reverse(array_sort(scoredCells)), 1, nProbe)).as("pc"))
      .withColumn("qres",
        zip_with(col("qee"), element_at(centMap, col("pc.cell")), (x, c) => x - c))
      .select(col("query_id"), col("pc.cell").as("cell"), array(dt: _*).as("dt"))
    // ADC over probed cells only: 8 lookups + 8 decimal adds per candidate
    val adc = enc.join(broadcast(qside), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adist", (0 until PqM).map(s =>
          element_at(element_at(col("dt"), s + 1), col("codes")(s) + 1)
            .cast("decimal(18,4)"))
        .reduce(_ + _).cast("double"))
      .select(col("query_id"), col("neighbor_id"), (-col("adist")).as("sim"))
    val top = topKPerQuery(adc, cand, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), (-col("sim")).as("adist"))
    // exact rerank — identical tail to n9/n10 (the n1 float contract)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("nq"))
    val rer = e.select(col("vec_id").as("neighbor_id"), col("embedding"),
        norm(col("embedding")).as("nv"))
      .join(broadcast(top.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qe"), col("embedding"), col("nq"), col("nv")).as("sim"))
    topKPerQuery(rer, k, Seq("query_id"))
      .join(broadcast(top), Seq("query_id", "neighbor_id"))
      .select("query_id", "neighbor_id", "rnk", "sim", "adist")
  }
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame =
    ivfPqTopK(table(spark, dir, "embeddings"))

  /** N13 — MMR: maximal-marginal-relevance DIVERSIFIED top-k (Carbonell &
    * Goldstein, SIGIR 1998) — the reranker between vector search and a RAG
    * context window: greedily pick the candidate maximizing
    * λ·sim(q, d) − μ·max_{s∈picked} sim(d, s), so near-duplicate passages
    * stop crowding out coverage. Candidate pool = n1's exact contract
    * (4-dp cosine, ties by neighbor id) at `pool` per query; `k` greedy
    * rounds UNROLLED with the argmax on the 4-dp-quantized MMR score
    * (ties → smaller neighbor id), the fixed-round convention that lets
    * the oracle state the identical greedy prefix as chained CTEs. λ and
    * μ are INDEPENDENT literals (μ is not computed as 1−λ: binary 1−0.7
    * is 0.30000000000000004 and engines would quantize differently near
    * ties).
    *
    * Scale notes (100 TB): the only corpus-scale work is the candidate
    * search itself (n1's broadcast-queries/no-corpus-shuffle shape, or any
    * ANN face upstream); everything after is pool-bounded by construction
    * — the pair matrix is |Q|·pool² rows (report-sized), each greedy round
    * joins frames of ≤ |Q|·pool rows, and per-round picks localCheckpoint
    * (k tiny jobs, the g7/g13 iterative discipline) so the plan never
    * compounds across rounds.
    */
  def mmrTopK(e: DataFrame, k: Int = ServeK, pool: Int = ServePool,
      lambda: Double = MmrLambda, mu: Double = MmrMu): DataFrame = {
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    mmrOver(e, searchTopK(e, queries, pool)
      .select(col("query_id"), col("neighbor_id"), col("sim")), k, lambda, mu)
  }
  def mmrTopK(spark: SparkSession, dir: String): DataFrame =
    mmrTopK(table(spark, dir, "embeddings"))

  /** The MMR greedy core over an ARBITRARY candidate pool `(query_id,
    * neighbor_id, sim)` — n13 feeds it the brute n1 pool; the c5 serving
    * capstone feeds it n10's probe-bounded reranked pool. Pool-bounded by
    * construction regardless of the upstream search.
    *
    * Shape (round 14): ONE query-keyed exchange, then the k greedy rounds
    * run INSIDE each query's group as a deterministic in-task fold
    * (`flatMapGroups` over ≤ pool + pool² rows per query — genuinely
    * imperative sequential logic over a bounded group, the sanctioned
    * mapGroups case). The previous form unrolled the rounds as k
    * cluster-wide supersteps (per-round joins + eager checkpoints): correct
    * and pool-bounded, but each of |Q| independent greedy selections was
    * synchronized at every round — k global barriers and ~4k tiny jobs for
    * work with zero cross-query dependency. Here queries parallelize
    * embarrassingly and the job count is constant in k. Arithmetic is
    * bit-identical: sims/psims arrive 4-dp quantized, λ·sim − μ·red and the
    * floor-quantization run the same IEEE double ops Catalyst generated,
    * and both tie-breaks (round 1: sim desc then id asc; rounds 2+: mmr
    * desc then id asc) are explicit — the DuckDB oracle's unrolled CTE
    * chain hash-matches unchanged.
    *
    * Scale notes (100 TB): the pair matrix is |Q|·pool² rows (the only
    * corpus-touching work is the broadcast vector pull); the exchange moves
    * those rows once, keyed by query; per-group state is pool² doubles.
    * Nothing is driver-side and nothing is corpus-scale.
    */
  def mmrOver(e: DataFrame, candIn: DataFrame, k: Int,
      lambda: Double, mu: Double): DataFrame = {
    val cand = candIn.localCheckpoint(true)
    // pairwise 4-dp cosine within each query's pool: the candidate list
    // broadcasts into the corpus scan to pull vectors, then the pool
    // self-joins per query — |Q|·pool² rows, never corpus-squared
    val cv = e.select(col("vec_id").as("neighbor_id"), col("embedding"),
        norm(col("embedding")).as("nv"))
      .join(broadcast(cand.select("query_id", "neighbor_id")), Seq("neighbor_id"))
    val pa = cv.select(col("query_id"), col("neighbor_id").as("a"),
      col("embedding").as("ea"), col("nv").as("na"))
    val pb = cv.select(col("query_id"), col("neighbor_id").as("b"),
      col("embedding").as("eb"), col("nv").as("nb"))
    val pairs = pa.join(broadcast(pb), Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("psim"))
    // candidate rows (b null) and pair rows union into ONE query-keyed
    // group; the greedy fold below consumes both
    val rows = cand
      .select(col("query_id"), col("neighbor_id").as("a"),
        lit(null).cast("bigint").as("b"), col("sim"),
        lit(null).cast("double").as("psim"))
      .unionByName(pairs.select(col("query_id"), col("a"), col("b"),
        lit(null).cast("double").as("sim"), col("psim")))
    val spark = e.sparkSession
    import spark.implicits._
    rows.as[(Long, Long, Option[Long], Option[Double], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        mmrGreedy(qid, it, k, lambda, mu)
      }
      .toDF("query_id", "neighbor_id", "pick", "sim", "mmr")
  }

  /** The per-query greedy selection [[mmrOver]] distributes: `rows` carries
    * the query's candidates (b empty: (id, sim)) and pool pairs (b set:
    * (a, b, psim)). Exactly the unrolled-round contract: pick 1 = the
    * pool's rank-1 row (sim desc, id asc) with mmr = q4(λ·sim); picks 2..k
    * maximize q4(λ·sim − μ·max_{s∈picked} psim) with ties to the smaller
    * id, where a remaining candidate is eligible only once it has a pair
    * row against a picked item (the full pool pair matrix makes that
    * always true beyond degenerate single-member pools). All inputs are
    * 4-dp quantized upstream, so every compare here is on exact doubles.
    */
  private def mmrGreedy(qid: Long,
      rows: Iterator[(Long, Long, Option[Long], Option[Double], Option[Double])],
      k: Int, lambda: Double, mu: Double): Iterator[(Long, Long, Long, Double, Double)] = {
    val q4 = (x: Double) => math.floor(x * 10000.0 + 0.5) / 10000.0
    val cands = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val psim = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    rows.foreach {
      case (_, a, None, Some(sim), _) => cands += ((a, sim))
      case (_, a, Some(b), _, Some(p)) => psim((a, b)) = p
      case _ => ()
    }
    if (cands.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Double)]
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    // pick 1: rank-1 of the pool — max sim, ties to the smaller id
    val (id1, sim1) = cands.minBy { case (id, sim) => (-sim, id) }
    out += ((qid, id1, 1L, sim1, q4(lambda * sim1)))
    picked += id1
    for (r <- 2 to k) {
      val best = cands.iterator
        .filter { case (id, _) => !picked.contains(id) }
        .flatMap { case (id, sim) =>
          val reds = picked.flatMap(p => psim.get((id, p)))
          // eligibility mirrors the unrolled form's inner join on `red`
          if (reds.isEmpty) None
          else Some((id, sim, q4(lambda * sim - mu * reds.max)))
        }
        .reduceOption[(Long, Double, Double)] { case (x, y) =>
          // max by (mmr, then min id)
          if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
        }
      best.foreach { case (id, sim, mmr) =>
        out += ((qid, id, r.toLong, sim, mmr))
        picked += id
      }
    }
    out.iterator
  }

  /** C5's search-side composition — see
    * [[graft.operators.CurationOps.retrievalServe]] for the capstone face:
    * n10's probe-bounded IVF×SQ8 scan reranked exactly to a `pool`-sized
    * candidate list, then MMR-diversified. The serving path end-to-end:
    * candidate I/O follows the probed fraction, the pair matrix and greedy
    * rounds are pool-bounded, and every stage keeps its gate contract.
    */
  def retrievalServe(e: DataFrame, k: Int = ServeK, pool: Int = ServePool,
      nProbe: Int = ServeNProbe, lambda: Double = MmrLambda,
      mu: Double = MmrMu): DataFrame =
    mmrOver(e, ivfQuantizedTopK(e, k = pool, cand = pool, nProbe = nProbe)
      .select(col("query_id"), col("neighbor_id"), col("sim")), k, lambda, mu)
  def retrievalServe(spark: SparkSession, dir: String): DataFrame =
    retrievalServe(table(spark, dir, "embeddings"))

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

  /** IVF cell assignment against DRIVER-HELD centroid constants — the
    * streaming-capable twin of [[assignCells]]: per row, one codegen'd dot
    * product per centroid and an `array_max` over (score, −cell) structs, so
    * the argmax happens inside the row projection with NO join and NO
    * aggregation. That statelessness is the point: the same call works on a
    * `readStream` frame (continuous IVF indexing of an embedding stream) and
    * on a batch frame, and at 100 TB the corpus is never shuffled at all.
    * The centroid table is the coarse quantizer — small and slow-changing by
    * construction (the analog of the reference's driver-held router config,
    * app/dwd/BaseDBApp.java:100-118) — so holding it as literals is the same
    * contract as broadcasting it. Tie-break (max score, then min cell) and
    * float→double accumulation order match [[assignCells]] exactly.
    */
  def assignCellsLit(vectors: DataFrame, cents: Array[(Int, Array[Float])]): DataFrame = {
    require(cents.nonEmpty, "assignCellsLit needs at least one centroid")
    val scored = cents.map { case (cell, c) =>
      val cnorm2 = c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      struct((dot(col("embedding"), typedlit(c)) * 2.0 - lit(cnorm2)).as("score"),
        lit(-cell).as("negcell"), lit(cell).as("cell"))
    }
    vectors.withColumn("assigned_cell",
      array_max(array(scored.toIndexedSeq: _*)).getField("cell"))
  }

  /** SPILLED IVF assignment: index each vector under its `spill` nearest
    * cells (one output row per (vector, cell)) instead of only the nearest.
    * This is the replicated-IVF recall dial — boundary vectors whose true
    * neighbors straddle a cell edge become findable from EITHER side, so a
    * search hits them without probing more cells. The trade is explicit and
    * the standard one from the ANN literature (multi-assignment / spilling,
    * cf. spill trees and ScaNN's SOAR): index rows ×`spill`, query-time
    * probe I/O unchanged. Prefer raising `spill` over `nProbe` when queries
    * vastly outnumber index builds (probe cost is paid per query, spill cost
    * once per indexed vector).
    *
    * Same stateless map-only contract as [[assignCellsLit]] (centroids ride
    * as literals, works on streaming frames, corpus never shuffled): the
    * per-row argmax merely widens to a sort + slice over the k scored
    * structs, still inside one codegen'd projection. Descending sort on
    * (score, negcell) keeps the rank-1 cell byte-identical to
    * [[assignCellsLit]]'s tie-break (max score, then min cell).
    */
  def assignCellsLitSpill(vectors: DataFrame, cents: Array[(Int, Array[Float])],
      spill: Int): DataFrame = {
    require(cents.nonEmpty, "assignCellsLitSpill needs at least one centroid")
    require(spill >= 1 && spill <= cents.length,
      s"spill must be in [1, ${cents.length}], got $spill")
    val scored = cents.map { case (cell, c) =>
      val cnorm2 = c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      struct((dot(col("embedding"), typedlit(c)) * 2.0 - lit(cnorm2)).as("score"),
        lit(-cell).as("negcell"), lit(cell).as("cell"))
    }
    vectors.withColumn("assigned_cell",
      explode(transform(
        slice(reverse(array_sort(array(scored.toIndexedSeq: _*))), 1, spill),
        x => x.getField("cell"))))
  }

  /** Collect a centroid frame ([[centroids]] output) to the driver-held form
    * [[assignCellsLit]] consumes. Bounded by the quantizer's cell count.
    */
  def collectCentroids(cents: DataFrame): Array[(Int, Array[Float])] =
    cents.select(col("cell").cast("int"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))

  /** Lloyd's k-means training for the IVF coarse quantizer: iterate
    * assign → average until the largest centroid movement drops under `tol`
    * (euclidean) or `maxIter` rounds pass. Returns the trained centroids in
    * [[assignCellsLit]]'s driver-held form, sorted by cell.
    *
    * Deterministic CONTROL FLOW (auditable at 100 TB like the hash
    * samplers): seeding partitions the corpus by `vec_id % k` — no RNG —
    * and assignment tie-breaks (max score, min cell) are pinned in
    * [[assignCellsLit]]. The one caveat: centroid averaging sums doubles
    * across shuffle partials, whose merge order a cluster does not
    * guarantee, so re-training on a different partition layout can differ
    * in the last ulp (the standard distributed-k-means property; bounded
    * by float rounding, not by seed or tie-break nondeterminism).
    *
    * Scale notes: each round is ONE corpus aggregation — assignment is a
    * map-side projection against the k driver-held centroids (no join, no
    * corpus shuffle; [[assignCellsLit]]), and the mean reduces on
    * (cell, dim) with map-side partial agg, k·dims rows total. Driver state
    * and per-round collect are k centroids — the coarse quantizer is small
    * by construction. Empty cells keep their previous centroid (the
    * standard Lloyd fallback), so the cell count never silently shrinks.
    * Convergence is measured on the driver from the just-collected
    * centroids: no extra job, no growing lineage (each round's frame is
    * built fresh from the raw corpus and k literals).
    */
  def kmeansTrain(e: DataFrame, k: Int, maxIter: Int = 10,
      tol: Double = 1e-4): Array[(Int, Array[Float])] =
    kmeansTrain(e, k, maxIter, tol, trainFrac = 1.0)

  /** [[kmeansTrain]] over a deterministic hash SAMPLE of the corpus — the
    * production shape at 100 TB: a coarse quantizer needs only enough
    * vectors to place k centroids (k ≪ corpus), so every Lloyd round
    * scanning the full corpus is waste — train on `trainFrac`, then assign
    * EVERYTHING once with [[assignCellsLit]]/[[assignCellsLitSpill]]
    * (assignment is the map-only pass; training is the iterated one).
    * Sampling is a per-row `xxhash64(vec_id)` predicate — deterministic,
    * seedless, pushdown-friendly, the s1 recipe — so re-training on the
    * same corpus sees the same sample regardless of layout. Training rounds
    * then cost `trainFrac` of the corpus scan each; centroid quality
    * degrades only as the sample stops being representative (centroids are
    * means — their variance shrinks with sample size, not corpus size).
    */
  def kmeansTrain(e: DataFrame, k: Int, maxIter: Int,
      tol: Double, trainFrac: Double): Array[(Int, Array[Float])] =
    // converged centroids memoized per (session, corpus, params): the Lloyd
    // loop is an INDEX-time cost — before the memo, n2b (the consumer face)
    // re-paid the full training loop on every execution, which made it the
    // bench's second most expensive entry for no serving-path reason.
    // TrainMemo.clear() forces a genuine re-train where a spec needs one.
    TrainMemo.getOrCompute(
      TrainMemo.key(e, s"kmeans:$k:$maxIter:$tol:$trainFrac")) {
      kmeansTrainCompute(e, k, maxIter, tol, trainFrac)
    }

  private def kmeansTrainCompute(e: DataFrame, k: Int, maxIter: Int,
      tol: Double, trainFrac: Double): Array[(Int, Array[Float])] = {
    require(k > 0, "k-means needs k > 0")
    require(trainFrac > 0.0 && trainFrac <= 1.0,
      s"trainFrac must be in (0, 1], got $trainFrac")
    val train =
      if (trainFrac >= 1.0) e
      else e.filter(pmod(xxhash64(col("vec_id")), lit(10000L)) <
        lit((trainFrac * 10000).toLong))
    var cents = collectCentroids(centroids(
      train.withColumn("cell", (col("vec_id") % k).cast("int")), "cell"))
    var moved = Double.MaxValue
    var iter = 0
    while (iter < maxIter && moved > tol) {
      val assigned = assignCellsLit(train, cents)
        .withColumnRenamed("assigned_cell", "cell")
      val next = collectCentroids(centroids(assigned, "cell")).toMap
      moved = cents.map { case (cell, c) =>
        next.get(cell).fold(0.0) { n =>
          math.sqrt(c.zip(n).foldLeft(0.0) { case (a, (x, y)) =>
            a + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
          })
        }
      }.foldLeft(0.0)(math.max)
      cents = cents.map { case (cell, c) => (cell, next.getOrElse(cell, c)) }
      iter += 1
    }
    cents.sortBy(_._1)
  }

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
    ivfSearchAssigned(assigned, cents, queries, k, nProbe)
  }

  /** [[ivfSearch]] over a corpus whose `cell` column already exists — the
    * form a real deployment runs (assignment is paid once at indexing time,
    * or map-side via [[assignCellsLit]]; search never re-quantizes the
    * corpus).
    */
  def ivfSearchAssigned(assigned: DataFrame, cents: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int): DataFrame =
    ivfSearchAssigned(assigned, cents, queries, k, nProbe,
      dedupCandidates = false)

  /** [[ivfSearchAssigned]] over a SPILLED index
    * ([[assignCellsLitSpill]] with spill > 1): a vector indexed under two
    * probed cells surfaces as two identical candidate rows, which would
    * otherwise occupy two top-k slots — `dedupCandidates` collapses them
    * before ranking. The distinct keys on (query, neighbor, sim): candidate
    * volume, not corpus volume (queries × probed fraction), so the extra
    * exchange stays query-sized at any corpus scale. Keep it OFF for
    * single-assignment indexes where candidates are unique by construction.
    */
  def ivfSearchAssigned(assigned: DataFrame, cents: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int,
      dedupCandidates: Boolean): DataFrame = {
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
    topKPerQuery(if (dedupCandidates) sims.distinct() else sims, k,
      Seq("query_id"))
  }

  /** N2b — the TRAINED IVF pipeline end-to-end: [[kmeansTrain]] learns the
    * coarse quantizer, [[assignCellsLit]] assigns every corpus vector
    * map-side against the k driver-held centroids (no join, no corpus
    * shuffle), and [[ivfSearchAssigned]] probes each query's `nProbe`
    * nearest trained cells. n2's face consumes the fixture's pre-assigned
    * `label` column; this face is what a deployment with no precomputed
    * labels runs. Not oracle-stateable in one SQL query (Lloyd's loop is
    * iterative float averaging), so the gate is behavioral: `AnnOpsSpec`
    * pins the recall bound (≥ 50% of n1's brute-force truth at 3/8 probes,
    * asserted at sf0.1) and the bench records its wall time.
    */
  def ivfTrainedTopK(e: DataFrame, k: Int = 8, topK: Int = 5,
      nProbe: Int = 3, spill: Int = 1): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cents = kmeansTrain(e, k)
    val assigned = (if (spill == 1) assignCellsLit(e, cents)
      else assignCellsLitSpill(e, cents, spill))
      .withColumnRenamed("assigned_cell", "cell")
    val centsDf = cents.toSeq.toDF("cell", "centroid")
    ivfSearchAssigned(assigned, centsDf, e.filter(col("vec_id") < 10), topK,
      nProbe, dedupCandidates = spill > 1)
      .select("query_id", "neighbor_id", "rnk", "sim")
  }

  /** The benched n2b face runs spill=2: at the same 3/8 probe fraction the
    * spilled index lifts measured recall 0.72 → ~0.9 at sf0.1 (vs 0.82 for
    * nProbe=4 on a single-assignment index) for 2× index rows and zero
    * extra probe I/O — the right side of the trade when queries dominate.
    */
  def ivfTrainedTopK(spark: SparkSession, dir: String): DataFrame =
    ivfTrainedTopK(table(spark, dir, "embeddings"), spill = 2)

  // ---- Product quantization (PQ/ADC) ---------------------------------------

  /** PQ geometry: 64-dim vectors split into `PqM` subspaces of `PqDims`
    * dims, `PqK` codes per subspace — 8 bytes/vector, the classic
    * IVFADC-compatible layout (Jégou, Douze, Schmid, TPAMI 2011).
    */
  private val PqM = 8
  private val PqK = 16
  private val PqDims = 8

  /** PQ codebook from SEED-PARTITION MEANS: code (s, j) = the 6-dp
    * integer-exact mean (d16's centroid recipe) of subvector s over vectors
    * with `vec_id % PqK == j` — Lloyd's SEEDING step stated as one
    * aggregation, which keeps the whole PQ pipeline oracle-stateable in a
    * single SQL query (a full per-subspace Lloyd's refinement drops in via
    * [[kmeansTrain]] on the sliced subvectors — same map, same consumers —
    * but is iterative float averaging, n2b's sanctioned no-oracle
    * territory, so the gated face stays with seed means).
    *
    * Returns ((s, j) → (centroid, ‖centroid‖²)); `PqM·PqK` entries — tiny,
    * driver-held by construction like [[assignCellsLit]]'s centroids.
    * Scale: ONE (j, s, p)-keyed aggregation of the corpus with map-side
    * partials.
    */
  def pqCodebook(e: DataFrame): Map[(Int, Int), (Array[Double], Double)] =
    pqCodebookOf(e, "embedding")

  /** n11's residual codebook: POINT seeds (the residual subvectors of
    * vec_id 0..PqK-1 — Lloyd's "first k points" seeding, deterministic and
    * collected in one tiny filter) refined by `rounds` unrolled Lloyd
    * steps. Each step assigns every subvector to its nearest code by the
    * SAME 4-dp-quantized sq-L2 the encoder uses (ties to the lower code
    * id) and recomputes each code as the 6-dp integer-exact mean of its
    * members; a code that attracts no members keeps its previous centroid
    * (the standard empty-cell rule, stated as a left-join coalesce in the
    * oracle). A fixed round count — not convergence — keeps the whole
    * training prefix oracle-stateable, the g7/g13 convention for
    * iterative work.
    *
    * Scale notes (100 TB): each round is ONE (s, j, p)-keyed aggregation
    * of the corpus with map-side partials (assignment is a literal
    * projection against the driver-held codebook, the assignCellsLit
    * contract); PqM·PqK·PqDims output doubles collect per round. This is
    * index-time cost, amortized across queries.
    */
  private def pqLloydCodebook(df: DataFrame,
      rounds: Int): Map[(Int, Int), (Array[Double], Double)] = {
    val seeds = df.filter(col("vec_id") < PqK)
      .select(col("vec_id").cast("int").as("j"), col("res"))
      .collect().flatMap { r =>
        val j = r.getInt(0)
        val v = r.getSeq[Double](1)
        (0 until PqM).map { s =>
          val c = v.slice(s * PqDims, (s + 1) * PqDims).toArray
          ((s, j), (c, c.foldLeft(0.0)((a, x) => a + x * x)))
        }
      }.toMap
    // downstream encode does cb((s, j)) for EVERY j < PqK — a corpus
    // missing any vec_id in 0..PqK-1 would otherwise surface as an opaque
    // NoSuchElementException deep inside the codegen'd encode
    require((0 until PqM).forall(s => (0 until PqK).forall(j => seeds.contains((s, j)))),
      s"point seeding needs vec_ids 0..${PqK - 1} present in the corpus")
    var cb = seeds
    for (_ <- 1 to rounds) {
      // assignment via the native one-pass PqEncodeExpr — bit-identical to
      // the composed array_min(pqScoredCodes(...)) form (spec-pinned) but
      // codegen'd: the composed form paid 2·PqM·PqK interpreted lambda
      // folds per row and re-analyzed a PqM·PqK-branch struct tree every
      // round. Computed BEFORE the generator select: an aliased generator
      // in the same projection re-resolves lambda structs (analyzer
      // CleanupAliases quirk)
      val upd = df.withColumn("codes",
          graft.functions.PqFunctions.pq_encode(col("res"), cb, PqM, PqDims, PqK))
        .select(col("codes"), posexplode(col("res")).as(Seq("dim", "v")))
        .withColumn("s", expr(s"dim div $PqDims").cast("int"))
        .withColumn("p", expr(s"dim % $PqDims").cast("int"))
        .withColumn("j", element_at(col("codes"), col("s") + 1).cast("int"))
        .withColumn("vq", floor(col("v") * 1e6 + 0.5).cast("long"))
        .groupBy("s", "j", "p")
        .agg(sum("vq").as("sm"), count(lit(1)).as("n"))
        .withColumn("m", floor(col("sm").cast("double") / col("n") + 0.5) / 1e6)
        .groupBy("s", "j")
        .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("pm"))
        .select(col("s"), col("j"),
          transform(col("pm"), x => x.getField("m")).as("c"))
        .collect().map { r =>
          val c = r.getSeq[Double](2).toArray
          ((r.getInt(0), r.getInt(1)), (c, c.foldLeft(0.0)((a, x) => a + x * x)))
        }.toMap
      cb = cb ++ upd // codes with no members keep their previous centroid
    }
    cb
  }

  /** [[pqCodebook]] over an arbitrary vector column — n6 trains on the raw
    * embeddings; identical arithmetic either way (the double cast is a
    * no-op on double input).
    */
  private def pqCodebookOf(e: DataFrame,
      vecCol: String): Map[(Int, Int), (Array[Double], Double)] =
    // one corpus-keyed aggregation, trained once per (session, corpus) —
    // n6 re-derived it per execution before the memo
    TrainMemo.getOrCompute(TrainMemo.key(e, s"pqCodebook:$vecCol")) {
      pqCodebookCompute(e, vecCol)
    }

  private def pqCodebookCompute(e: DataFrame,
      vecCol: String): Map[(Int, Int), (Array[Double], Double)] = {
    val cb = e.select((col("vec_id") % PqK).cast("int").as("j"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .withColumn("s", expr(s"dim div $PqDims").cast("int"))
      .withColumn("p", expr(s"dim % $PqDims").cast("int"))
      .withColumn("vq", floor(col("v").cast("double") * 1e6 + 0.5).cast("long"))
      .groupBy("j", "s", "p")
      .agg(sum("vq").as("sm"), count(lit(1)).as("n"))
      .withColumn("m", floor(col("sm").cast("double") / col("n") + 0.5) / 1e6)
      .groupBy("j", "s")
      .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("pm"))
      .select(col("s"), col("j"), transform(col("pm"), x => x.getField("m")).as("c"))
    cb.collect().map { r =>
      val c = r.getSeq[Double](2).toArray
      ((r.getInt(0), r.getInt(1)), (c, c.foldLeft(0.0)((a, x) => a + x * x)))
    }.toMap
  }

  /** Per-subspace scored codes: array<struct(dq, j)> of the 4-dp-quantized
    * squared L2 between subvector `xs` and EVERY code of one subspace's
    * codebook — ‖x‖² − 2·x·c + ‖c‖², every fold sequential left-to-right
    * double (the exact arithmetic DuckDB's double-list `list_dot_product`
    * runs, so encode/ADC hash-match).
    *
    * The codebook rides as ONE array-of-structs literal and the scoring is
    * one `transform` loop over it — data, not unrolled expressions. The
    * first cut unrolled 8×16 separate zip_with folds and spent its wall
    * time in janino compiling the megabyte of generated code (the SrpSig
    * lesson); this shape keeps codegen at one inner loop.
    */
  private def pqScoredCodes(xs: Column,
      entries: Seq[(Int, Seq[Double], Double)]): Column = {
    val sx = aggregate(xs, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    transform(typedlit(entries), e =>
      struct(
        (floor((sx - lit(2.0) * aggregate(zip_with(xs, e.getField("_2"),
          (x, y) => x.cast("double") * y), lit(0.0), (a, b) => a + b) +
          e.getField("_3")) * 10000.0 + 0.5) / 10000.0).as("dq"),
        e.getField("_1").as("j")))
  }

  /** The (j, centroid, ‖c‖²) entries of subspace `s`, ascending code id —
    * the literal [[pqScoredCodes]] consumes.
    */
  private def pqEntries(cb: Map[(Int, Int), (Array[Double], Double)],
      s: Int): Seq[(Int, Seq[Double], Double)] =
    (0 until PqK).map { j => val (c, sc) = cb((s, j)); (j, c.toSeq, sc) }

  /** PQ ENCODE: per vector, per subspace, the nearest code by quantized
    * squared L2 (ties to the lower code id) — adds a `codes` byte-array
    * column (`PqM` ints). Map-only against the driver-held codebook: the
    * [[assignCellsLit]] contract — no join, no shuffle, streaming-capable,
    * and at 100 TB the corpus is encoded in one scan and stored as 8
    * ints/vector (the 64× compression that makes exhaustive ADC scans
    * feasible at all).
    */
  def pqEncode(vectors: DataFrame,
      cb: Map[(Int, Int), (Array[Double], Double)]): DataFrame =
    // the native one-pass PqEncodeExpr — bit-identical to the composed
    // array_min(pqScoredCodes(...)) per-subspace form it replaced
    // (PqEncodeSpec pins parity on BOTH float and double inputs)
    vectors.withColumn("codes",
      graft.functions.PqFunctions.pq_encode(col("embedding"), cb, PqM, PqDims, PqK))

  /** N6 — PQ/ADC search: queries (vec_id < 10) build a per-subspace
    * distance table against the codebook; every corpus vector's
    * approximate distance is the sum of `PqM` table lookups at its stored
    * codes (asymmetric distance computation — the query stays exact, only
    * the corpus is quantized). Top-5 per query, ascending distance, ties
    * to the lower neighbor id.
    *
    * Determinism: each dtable entry is the same 4-dp-quantized sq-L2 the
    * encoder minimizes, and the 8-term ADC sum rides DECIMAL(18,4) — so
    * shuffle merge order cannot move the hash and the DuckDB oracle
    * replays the whole pipeline (codebook → codes → dtable → sum) exactly.
    *
    * Scale notes (100 TB): encode is map-only (see [[pqEncode]]); the
    * query side broadcasts dtables (queries × 8×16 doubles), so the scan
    * side streams through a broadcast nested loop with NO corpus shuffle —
    * per candidate the work is 8 array lookups + 8 decimal adds, no
    * float vector math at all (the ADC win) — and the top-k reduction is
    * the two-phase partial [[topKPerQuery]], never a single reducer.
    */
  def pqAdcTopK(e: DataFrame, k: Int = 5): DataFrame = {
    val cb = pqCodebook(e)
    val enc = pqEncode(e, cb).select(col("vec_id").as("neighbor_id"), col("codes"))
    val dt = (0 until PqM).map { s =>
      val xs = slice(col("embedding"), s * PqDims + 1, PqDims)
      transform(pqScoredCodes(xs, pqEntries(cb, s)), e => e.getField("dq"))
    }
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), array(dt: _*).as("dt"))
    val sims = enc.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adist", (0 until PqM).map(s =>
          element_at(element_at(col("dt"), s + 1), col("codes")(s) + 1)
            .cast("decimal(18,4)"))
        .reduce(_ + _).cast("double"))
      .select(col("query_id"), col("neighbor_id"), (-col("adist")).as("sim"))
    topKPerQuery(sims, k, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        (-col("sim")).as("adist"))
  }
  def pqAdcTopK(spark: SparkSession, dir: String): DataFrame =
    pqAdcTopK(table(spark, dir, "embeddings"))

  /** D16 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering then within-cluster cosine pruning — the
    * published recipe behind LAION/web-scale curation runs. The corpus is
    * k-means-clustered (here the fixture's `label` coarse assignment, the
    * same convention as n2/d6 — a trained quantizer plugs in via
    * [[kmeansTrain]] + [[assignCellsLit]]); within each cluster, any pair
    * with cosine ≥ `threshold` is a semantic-duplicate edge, and the member
    * KEPT is the one with the LOWEST cosine to its cluster centroid — the
    * paper's "keep cluster outliers" rule (§4.3: low-centroid-similarity
    * examples preserved diversity best in their CLIP/LM ablations).
    *
    * Determinism contract (oracle-hash-exact): the centroid is an
    * integer-arithmetic mean — each float scaled to a 6-dp BIGINT
    * (`floor(v·1e6 + 0.5)`), summed exactly, divided by the cluster count
    * with one deterministic double division, re-floored — so no
    * engine-specific decimal rounding mode or float summation order can
    * touch it; cosines are 4-dp floor-quantized like every vector op here,
    * and the drop rule tie-breaks (cent_sim, vec_id) lexicographically.
    *
    * Scale notes (100 TB): centroid training is ONE (label, dim)-keyed
    * aggregation of the corpus with map-side partials (k·64 output rows,
    * broadcast back); the pair join is within-cluster only — candidate
    * volume is bounded by cell population like d6/d3, never n² — and the
    * drop set reduces per vec_id with partial agg. Run exact dedup (d1)
    * first on duplication-heavy corpora for the same cell-inflation reason
    * documented on [[embeddingNearDups]].
    */
  def semDedup(e: DataFrame, threshold: Double = 0.95): DataFrame = {
    // 6-dp integer-exact per-dim centroid mean (see determinism contract)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("vq", floor(col("v").cast("double") * 1e6 + 0.5).cast("long"))
      .groupBy("label", "dim")
      .agg(sum("vq").as("s"), count(lit(1)).as("n"))
      .withColumn("m", floor(col("s").cast("double") / col("n") + 0.5) / 1e6)
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("label"), transform(col("dm"), x => x.getField("m")).as("centroid"))
    // double-array dot/norm for the (float vector) · (double centroid) case:
    // sequential left-to-right double fold, the exact shape DuckDB's
    // list_dot_product computes for mixed float/double lists
    def dotd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y), lit(0.0), (acc, x) => acc + x)
    def normd(a: Column): Column =
      sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val scored = e.join(broadcast(cents), Seq("label"))
      .select(col("label"), col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nv"),
        (floor(dotd(col("embedding"), col("centroid")) /
          (norm(col("embedding")) * normd(col("centroid"))) * 10000.0 + 0.5) / 10000.0)
          .as("cent_sim"))
    val a = scored.select(col("label"), col("vec_id"), col("embedding").as("ea"),
      col("nv").as("na"), col("cent_sim").as("ca"))
    val b = scored.select(col("label"), col("vec_id").as("other_id"),
      col("embedding").as("eb"), col("nv").as("nb"), col("cent_sim").as("cb"))
    val dropped = a.join(b, Seq("label"))
      .filter(col("other_id") =!= col("vec_id"))
      .filter(cosinePre(col("ea"), col("eb"), col("na"), col("nb")) >= threshold)
      .filter(col("cb") < col("ca") ||
        (col("cb") === col("ca") && col("other_id") < col("vec_id")))
      .select(col("vec_id")).distinct()
      .withColumn("_drop", lit(true))
    scored.select(col("vec_id"), col("label"), col("cent_sim"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("cent_sim"),
        col("_drop").isNull.as("keep"))
  }
  /** The gated query face runs τ=0.35: the synthetic corpus's random-ish
    * embeddings compress within-cell cosines under ~0.47 (max observed),
    * so the production 0.95 would never exercise the drop rule — 0.35
    * sits at the ~99.9th within-cell percentile and prunes a real handful
    * each SF, keeping the keep/drop logic on the oracle's hash path.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    semDedup(table(spark, dir, "embeddings"), threshold = 0.35)

  /** [[semDedup]] end-to-end with a TRAINED coarse clustering — the form a
    * corpus with no precomputed cluster column runs: [[kmeansTrain]] learns
    * k centroids, [[assignCellsLit]] labels every vector map-side (no
    * corpus shuffle), and the SemDeDup prune runs within the learned
    * cells. Not oracle-stateable (Lloyd's loop — the n2b precedent);
    * behavior is spec-pinned instead.
    */
  def semDedupTrained(e: DataFrame, k: Int = 8,
      threshold: Double = 0.95): DataFrame = {
    val clustered = assignCellsLit(e.drop("label"), kmeansTrain(e, k))
      .withColumnRenamed("assigned_cell", "label")
    semDedup(clustered, threshold)
  }

  /** B2 — semantic benchmark decontamination: the embedding-space complement
    * of t5's n-gram recipe. Every 97th vector stands in for the held-out
    * benchmark embedding set (mirroring t5's convention); a corpus vector is
    * contaminated when its best cosine against ANY benchmark vector reaches
    * `threshold`. Reports the max similarity so thresholds can be re-swept
    * without recomputing.
    *
    * Scale notes (100 TB): the benchmark set is small by construction (eval
    * suites are thousands of rows, the corpus is billions), so it BROADCASTS
    * and the whole operator is a map-side scan — corpus norms computed once
    * below the join, one fused dot per (vector, benchmark) pair, then a
    * doc-keyed max with map-side partial agg. No corpus shuffle of
    * embeddings, nothing quadratic in the corpus.
    */
  def semanticDecontaminate(e: DataFrame, threshold: Double = 0.95): DataFrame = {
    val bench = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("bench_id"), col("embedding").as("be"),
        norm(col("embedding")).as("nb"))
    e.filter(col("vec_id") % 97 =!= 0)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nv"))
      .crossJoin(broadcast(bench))
      .select(col("vec_id"),
        cosinePre(col("embedding"), col("be"), col("nv"), col("nb")).as("sim"))
      .groupBy("vec_id")
      .agg(max(col("sim")).as("max_sim"))
      .withColumn("is_contaminated", col("max_sim") >= threshold)
  }
  def semanticDecontaminate(spark: SparkSession, dir: String): DataFrame =
    semanticDecontaminate(table(spark, dir, "embeddings"))
}
