package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  /** The SQL-composed reference formulation the native expression replaced —
    * kept here as the correctness oracle for it.
    */
  private def composedSig(shingles: org.apache.spark.sql.Column) = {
    def fam(salt: Int, slice: Int) =
      array_min(transform(shingles,
        s => substring(md5(concat(lit(s"$salt:"), s)), 1 + 8 * slice, 8)))
    array((0 until 8).map(i => fam(i / 4, i % 4)): _*)
  }

  test("native signature is bit-identical to the SQL-composed formulation") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .withColumn("shingles", split(col("text"), " ")) // any string array works
    val mismatches = docs
      .select(MinHashSig(col("shingles")).as("native"),
        composedSig(col("shingles")).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches === 0)
  }

  test("interpreted eval matches codegen output") {
    val df = Seq(Seq("a b c", "b c d"), Seq("z")).toDF("shingles")
    val viaCodegen = df.select(MinHashSig(col("shingles"))).collect()
    val viaEval = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.select(MinHashSig(col("shingles"))).collect()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(viaCodegen.map(_.toString).toSeq === viaEval.map(_.toString).toSeq)
  }

  test("empty and null-element arrays degrade like array_min (null families)") {
    val df = Seq((1, Seq.empty[String]), (2, null)).toDF("id", "shingles")
    val out = df.select(col("id"), MinHashSig(col("shingles")).as("sig"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[String](1))).toMap
    assert(out(1) === Some(Seq(null, null, null, null, null, null, null, null)))
    assert(out(2) === None) // null input -> null signature
  }
}
