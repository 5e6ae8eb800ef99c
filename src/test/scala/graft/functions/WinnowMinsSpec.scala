package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowMinsSpec extends SparkSpec {
  import spark.implicits._

  /** The composed higher-order formulation the native expression replaced —
    * kept as its correctness oracle (hash = hex16 of md5(3-shingle), min of
    * each 4-hash window, short docs degrade to the global min).
    */
  private def composedMins(words: org.apache.spark.sql.Column) = {
    val hashes = transform(
      transform(sequence(lit(1), size(words) - 2),
        i => concat_ws(" ", slice(words, i, lit(3)))),
      g => conv(substring(md5(g), 1, 4), 16, 10).cast("long"))
    transform(sequence(lit(1), greatest(lit(1), size(words) - 2 - 3)),
      i => array_min(slice(hashes, i, lit(4))))
  }

  test("native winnow mins are identical to the composed formulation") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
    val mismatches = docs
      .select(WinnowMins(col("words"), 4).as("native"),
        composedMins(col("words")).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches === 0)
  }

  test("interpreted eval matches codegen output") {
    val df = Seq(
      Seq("a", "b", "c", "d", "e", "f", "g", "h"),
      Seq("x", "y", "z"), // one shingle -> one global min
      Seq("p", "q", "r", "s", "t")).toDF("words")
    val viaCodegen = df.select(WinnowMins(col("words"), 4)).collect()
    val viaEval = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.select(WinnowMins(col("words"), 4)).collect()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(viaCodegen.map(_.toString).toSeq === viaEval.map(_.toString).toSeq)
  }

  test("sub-shingle inputs yield empty selection; null input stays null") {
    val df = Seq((1, Seq("a", "b")), (2, Seq.empty[String]), (3, null))
      .toDF("id", "words")
    val out = df.select(col("id"), WinnowMins(col("words"), 4).as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1) === Some(Seq.empty))
    assert(out(2) === Some(Seq.empty))
    assert(out(3) === None)
  }
}
