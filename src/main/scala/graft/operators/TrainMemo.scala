package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped memo for DRIVER-HELD trained index artifacts — converged
  * k-means centroids ([[AnnOps.kmeansTrain]]), the label-seeded coarse
  * quantizer ([[AnnOps.ivfQuantizedTopK]]/[[AnnOps.ivfPqTopK]]'s
  * `seededCentroids`), and PQ codebooks. The [[ClusterMemo]] idea applied to
  * plain JVM values instead of checkpointed frames.
  *
  * Why: an ANN index is trained ONCE and served many times — that is the
  * whole 100 TB serving shape (FAISS persists the codebook with the index;
  * the reference's analog is the driver-held router config,
  * app/dwd/BaseDBApp.java:100-118, loaded once and broadcast). Before this
  * memo, every CONSUMER execution re-ran its training prefix: n2b re-paid the
  * full Lloyd loop per call and c5/n10/n11 re-derived the coarse
  * centroids/SQ8 stats per call — the two most expensive roster entries were
  * expensive solely from re-paid training.
  *
  * Keying follows [[ClusterMemo]]: the `semanticHash` of the input frame's
  * CANONICALIZED analyzed plan (exprId-normalized — two structurally
  * identical reads of the same files collide exactly; `LocalRelation` hashes
  * its rows and `LogicalRDD` its RDD identity, so in-memory test frames can
  * never false-hit) plus every training parameter. A hit can therefore only
  * return the artifact the caller's own inputs and parameters would have
  * produced. Values are centroid arrays / codebook maps — k·dims or
  * PqM·PqK·PqDims doubles, driver-held by construction — so no storage-level
  * liveness tracking is needed; LRU eviction bounds a long-lived streaming
  * session the same way ClusterMemo's does.
  */
private[graft] object TrainMemo {
  private val MaxEntries = 64
  private val memo =
    new java.util.LinkedHashMap[String, AnyRef](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, AnyRef]): Boolean =
        this.size() > MaxEntries
    }

  /** Number of times a training compute actually ran — specs pin reuse by
    * asserting this does NOT advance on a second structurally identical call.
    */
  @volatile var computeCount: Long = 0L

  /** The canonical key for an artifact trained from `df` under `params`
    * (include EVERY parameter that can change the trained result).
    */
  def key(df: DataFrame, params: String): String = {
    val sc = df.sparkSession.sparkContext
    val h = df.queryExecution.analyzed.canonicalized.semanticHash()
    s"${sc.applicationId}:$params:$h"
  }

  // All access serializes on `memo` (access-order LinkedHashMap bookkeeping
  // is not thread-safe, and two concurrent misses for one key would
  // double-pay the training job). Bench/Verify are single-threaded; the lock
  // is for test suites with parallel sessions.
  def getOrCompute[T <: AnyRef](key: String)(compute: => T): T =
    memo.synchronized {
      val cached = memo.get(key)
      if (cached != null) cached.asInstanceOf[T]
      else {
        val fresh = compute
        computeCount += 1
        memo.put(key, fresh)
        fresh
      }
    }

  /** Drop every entry — test teardown hook, and the way a spec forces a
    * genuine re-train (e.g. AnnOpsSpec's determinism re-run).
    */
  def clear(): Unit = memo.synchronized(memo.clear())

  /** Live entry count — spec hook for the eviction bound. */
  def size: Int = memo.synchronized(memo.size())
}
