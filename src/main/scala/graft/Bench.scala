package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/session warmup outside the timed loop
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try graft.Tables.table(spark, sfDir, "lineitem").limit(1).count()
    catch { case _: Throwable => }
    // SPARK_GRAFT_FRESH_SESSION=1: run each query in its own newSession()
    // (isolated SQL conf, temp views, UDF registry; the SparkContext and
    // JVM-wide codegen cache are shared by design) — the repeat-run
    // stability mode: cross-query session state can't leak into timings
    val freshSession = sys.env.get("SPARK_GRAFT_FRESH_SESSION").contains("1")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val s = if (freshSession) spark.newSession() else spark
      val t0 = System.nanoTime()
      // a query that RAISES records -1 (excluded from the total), not its
      // elapsed-to-failure — e.g. d7's demo-width gate fails loudly beyond
      // 1k docs by contract, and a fake-fast number would read as a pass
      val sec = try { fn(s, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
      // isolation between queries (outside the timed span): operators that
      // .cache() intermediate tables (d3/d5/d7/d8) would otherwise keep
      // their blocks pinned across the remaining queries, and the resulting
      // memory pressure moves later queries' numbers ±3× run to run
      // (the cache manager lives in SharedState, so this clears every session)
      s.catalog.clearCache()
      name -> sec
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // machine-readable channel: a file the driver can read verbatim (sbt
    // decorates stdout; Spark logs interleave on stderr) — stdout line kept
    // for the log-scrape path, emitted last and unprefixed (StdoutOutput)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // marker-prefixed copy FIRST so a tail-scrape truncated mid-stream still
    // has one complete grep-able line; the bare line stays last for the
    // legacy scrape path
    println(s"GRAFT_BENCH_JSON:$json")
    spark.stop()
    println(json)
  }
}
