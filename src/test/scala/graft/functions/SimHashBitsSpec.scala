package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashBitsSpec extends SparkSpec {
  import spark.implicits._

  /** The SQL-composed reference formulation the native expression replaced —
    * kept here as the correctness oracle for it (hex-digit parity votes over
    * the word multiset, bit = sum > 0).
    */
  private def composedSimhash(docs: org.apache.spark.sql.DataFrame, bits: Int) = {
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val wordsDf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("h",
        if (bits <= 32) md5(col("word"))
        else concat(md5(col("word")), md5(concat(lit("x:"), col("word")))))
    val sums = (1 to bits).map(j =>
      sum(when(substring(col("h"), j, 1).isin(oddHex: _*), 1).otherwise(-1)).as(s"s$j"))
    wordsDf.groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        concat((1 to bits).map(j =>
          when(col(s"s$j") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  test("native fingerprint is bit-identical to the explode/groupBy formulation (16 and 64)") {
    val docs = graft.Tables.table(spark, sf, "documents").limit(200)
    for (bits <- Seq(16, 64)) {
      val native = docs.select(col("doc_id"),
        SimHashBits(split(col("text"), " "), bits).as("simhash"))
      val mismatches = native.join(composedSimhash(docs, bits)
          .withColumnRenamed("simhash", "expected"), Seq("doc_id"), "full")
        .filter(not(col("simhash") <=> col("expected")))
        .count()
      assert(mismatches === 0, s"bits=$bits")
    }
  }

  test("interpreted eval matches codegen output") {
    val df = Seq(Seq("spark", "join", "spark", ""), Seq("z")).toDF("words")
    val viaCodegen = df.select(SimHashBits(col("words"), 64)).collect()
    val viaEval = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.select(SimHashBits(col("words"), 64)).collect()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(viaCodegen.map(_.toString).toSeq === viaEval.map(_.toString).toSeq)
  }

  test("no non-empty words yields null (composed groupBy had no row)") {
    val df = Seq((1, Seq("", "")), (2, Seq.empty[String]), (3, null))
      .toDF("id", "words")
    val out = df.select(col("id"), SimHashBits(col("words"), 16).as("sh"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(out === Map(1 -> None, 2 -> None, 3 -> None))
  }

  test("tf weighting: repeated words shift the vote like repeated rows") {
    // one word repeated 3x must equal the fingerprint of that word once
    // (all votes same direction), and dominate a single different word
    val a = Seq(Seq("alpha"), Seq("alpha", "alpha", "alpha", "beta")).toDF("words")
    val rows = a.select(SimHashBits(col("words"), 64)).collect().map(_.getString(0))
    assert(rows(0) === rows(1), "3-1 majority must equal the pure fingerprint")
  }

  test("SQL surface: simhash_bits registered by GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT simhash_bits(array('spark','join'), 16) AS s").head.getString(0)
    assert(r.length === 16 && r.forall(c => c == '0' || c == '1'))
  }
}
