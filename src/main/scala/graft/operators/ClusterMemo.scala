package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for converged connected-components label frames — the
  * "share one closure per session" reuse the pipeline overloads
  * ([[DedupOps.dedupByCluster]](docs, clusters),
  * [[CurationOps.leakageSafeSplit]](docs, clusters)) already give callers who
  * thread labels explicitly. Six gate queries (d10, d11, s11, c2, c3 and e2's
  * name graph) each re-derive the SAME pointer-jumping closure in their own
  * lineage; at 100 TB the LSH pair generation + closure is the dominant cost
  * of the whole dedup family, so re-paying it per consumer multiplies the
  * single biggest bill in the pipeline. The memo keys on the CANONICALIZED
  * analyzed plans of the vertex and pair inputs (exprId-normalized, so two
  * structurally identical queries over the same files collide exactly), which
  * makes reuse a pure cache: a hit can only return the labels the caller's
  * own inputs would have produced.
  *
  * Lifecycle: the memoized frame is an eager `localCheckpoint` — its blocks
  * are its ONLY substance. [[protectedRddIds]] exposes the live block owners
  * so sweep-style cleanup (Bench's between-query unpersist-all) can skip
  * them; if something DOES unpersist a memoized frame's blocks (session
  * teardown, an explicit sweep), [[getOrCompute]] detects the dead storage
  * level and recomputes instead of serving a frame that would throw on
  * action. Entries are small by construction — (doc_id, cluster_id) over
  * pair-TOUCHED vertices only, the non-singleton minority of any real corpus.
  *
  * Since round 14 the memo also owns the ANN INDEX frames ([[AnnOps]]'s n10
  * IVF×SQ8 quantized corpus and n11 residual frame, keyed via
  * [[TrainMemo.key]]): same lifecycle (eager localCheckpoint, sweep-safe
  * liveness, LRU), same build-once/serve-many rationale — at 100 TB those
  * frames persist to storage with the index; the memo is the session-local
  * stand-in that stops every search from re-quantizing the corpus.
  */
private[graft] object ClusterMemo {
  /** Entry cap with LRU eviction: a long-lived STREAMING session computes a
    * fresh closure per micro-batch (new checkpointed inputs → new key —
    * entityResolveStream's shape), and without eviction every batch's label
    * blocks would stay protected-and-persisted for the session's lifetime.
    * Eviction unpersists the evictee's blocks; 32 keeps every batch/bench
    * consumer comfortably shared while bounding a stream to the last 32
    * closures' worth of pair-graph-sized frames.
    */
  private val MaxEntries = 32
  private val memo =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean = {
        val evict = size() > MaxEntries
        if (evict) {
          try liveRdds(e.getValue).foreach(_.unpersist(blocking = false))
          catch { case _: Throwable => () }
        }
        evict
      }
    }

  /** Number of times a compute (closure loop) actually ran — specs pin reuse
    * by asserting this does NOT advance on a second structurally identical
    * call.
    */
  @volatile var computeCount: Long = 0L

  private def liveRdds(df: DataFrame) =
    df.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** True iff every checkpoint block behind `df` is still persisted (and the
    * owning context is still alive). A frame with NO LogicalRDD leaves is
    * never valid here — the memo only stores eager checkpoints.
    */
  private def stillLive(df: DataFrame): Boolean =
    try {
      val rdds = liveRdds(df)
      rdds.nonEmpty && rdds.forall(_.getStorageLevel != StorageLevel.NONE)
    } catch { case _: Throwable => false }

  /** Block ids Bench's between-query sweep must leave alone. */
  def protectedRddIds: Set[Int] = memo.synchronized {
    import scala.jdk.CollectionConverters._
    memo.values.asScala.flatMap(df =>
      try liveRdds(df).map(_.id) catch { case _: Throwable => Nil }
    ).toSet
  }

  /** Drop every entry and release its blocks — test teardown hook. */
  def clear(): Unit = memo.synchronized {
    import scala.jdk.CollectionConverters._
    memo.values.asScala.foreach { df =>
      try liveRdds(df).foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
    memo.clear()
  }

  /** Live entry count — spec hook for the eviction bound. */
  def size: Int = memo.synchronized(memo.size())

  // All access serializes on `memo` (LinkedHashMap's access-order bookkeeping
  // is not thread-safe, and the compute runs Spark jobs that two concurrent
  // misses for the same key would double-pay). Bench/Verify are
  // single-threaded; the lock is for test suites with parallel sessions.
  def getOrCompute(key: String)(compute: => DataFrame): DataFrame =
    memo.synchronized {
      val cached = memo.get(key)
      if (cached != null && stillLive(cached)) cached
      else {
        val fresh = compute
        computeCount += 1
        memo.put(key, fresh)
        fresh
      }
    }
}
