// Per-OPERATOR profile of one declared query via the SQL status store
// (node-level metrics of the final adaptive plan, pass 2 = warm).
//   PROF_QUERY=<name> /opt/spark/bin/spark-shell --master local[32] ... -i tools/profile_sql.scala
val dir = sys.env.getOrElse("PROF_SF_DIR", "/root/testdata/sf0.1")
val qname = sys.env("PROF_QUERY")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
// pass 1: warm up
graft.SparkEntry.queries(qname)(spark, dir).count()
spark.catalog.clearCache()
Thread.sleep(500)
val store = spark.sharedState.statusStore
val before = store.executionsCount()
val t0 = System.nanoTime()
graft.SparkEntry.queries(qname)(spark, dir).count()
println(f"PASS2 ${(System.nanoTime()-t0)/1e9}%.3fs")
Thread.sleep(2000)
val execs = store.executionsList().filter(_.executionId >= before)
for (e <- execs) {
  println(s"=== execution ${e.executionId} ===")
  val g = store.planGraph(e.executionId)
  val vals = store.executionMetrics(e.executionId)
  val interesting = Set("time to build hash map", "time in aggregation build",
    "op time", "shuffle write time", "fetch wait time", "sort time",
    "scan time", "duration", "time to broadcast", "time to collect",
    "cache builds", "number of output rows")
  for (n <- g.allNodes) {
    val ms = n.metrics.flatMap(m => vals.get(m.accumulatorId)
        .map(v => s"${m.name}=${v.replace('\n', ' ')}"))
      .filter(s => interesting.exists(s.startsWith))
    if (ms.nonEmpty) println(f"  node ${n.id}%3d ${n.name}%-40s ${ms.mkString("  ")}")
  }
}
sys.exit(0)
