// Per-job/per-stage profile of one declared query (pass 2 = warm).
//   PROF_QUERY=<name> [PROF_SF_DIR=...] /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/profile_query.scala
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap
val dir = sys.env.getOrElse("PROF_SF_DIR", "/root/testdata/sf0.1")
val qname = sys.env("PROF_QUERY")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

case class StageRec(name: String, tasks: Int, ms: Long, taskMs: Long)
val jobs = TrieMap[Int, (Long, Long)]()        // jobId -> (start, end)
val jobStages = TrieMap[Int, Seq[Int]]()
val stages = TrieMap[Int, StageRec]()
val stageTaskMs = TrieMap[Int, Long]()
var capture = false
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(j: SparkListenerJobStart): Unit = if (capture) {
    jobs(j.jobId) = (j.time, 0L); jobStages(j.jobId) = j.stageIds
  }
  override def onJobEnd(j: SparkListenerJobEnd): Unit = if (capture)
    jobs.get(j.jobId).foreach(t => jobs(j.jobId) = (t._1, j.time))
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (capture && t.taskInfo != null)
    stageTaskMs.updateWith(t.stageId)(o => Some(o.getOrElse(0L) + (t.taskInfo.finishTime - t.taskInfo.launchTime)))
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit = if (capture) {
    val si = s.stageInfo
    val ms = (for {a <- si.submissionTime; b <- si.completionTime} yield b - a).getOrElse(-1L)
    stages(si.stageId) = StageRec(si.name.split('\n')(0).take(90), si.numTasks, ms, stageTaskMs.getOrElse(si.stageId, 0L))
  }
})
// pass 1: warm up (codegen/JIT), not captured
val t0w = System.nanoTime()
graft.SparkEntry.queries(qname)(spark, dir).count()
val warmSec = (System.nanoTime()-t0w)/1e9
spark.catalog.clearCache()
Thread.sleep(500)
// pass 2: captured
capture = true
val t0 = System.nanoTime()
graft.SparkEntry.queries(qname)(spark, dir).count()
val sec = (System.nanoTime()-t0)/1e9
capture = false
Thread.sleep(1000)
println(f"QUERY $qname pass1=${warmSec}%.3fs pass2=${sec}%.3fs")
val sortedJobs = jobs.toSeq.sortBy(_._1)
var prevEnd = 0L
for ((jid, (s, e)) <- sortedJobs) {
  println(f"JOB $jid%3d  wall=${(e-s)}%5dms  gapBefore=${if (prevEnd==0) 0 else s-prevEnd}%5dms")
  prevEnd = e
  for (sid <- jobStages.getOrElse(jid, Nil).sorted; r <- stages.get(sid))
    println(f"   stage $sid%4d tasks=${r.tasks}%4d wall=${r.ms}%5dms taskSum=${r.taskMs}%6dms  ${r.name}")
}
println(f"TOTAL jobs=${sortedJobs.size} jobWallSum=${sortedJobs.map{case (_, (s,e)) => e-s}.sum}ms query=${sec*1000}%.0fms")
sys.exit(0)
