package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KGramsSpec extends SparkSpec {
  import spark.implicits._

  /** The shifted-zip_with fold the native expression replaced (r14) — kept
    * as its correctness oracle: k−1 zips each concatenating the next shifted
    * word, trailing null partials sliced off.
    */
  private def composedKgrams(words: org.apache.spark.sql.Column, k: Int) = {
    val joined = (2 to k).foldLeft(words) { (acc, j) =>
      zip_with(acc, slice(words, lit(j), size(words)),
        (a, b) => concat(a, lit(" "), b))
    }
    slice(joined, lit(1), size(words) - (k - 1))
  }

  test("native k-grams are identical to the zip_with fold on the corpus") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .withColumn("words", split(col("text"), " "))
    for (k <- Seq(3, 8)) {
      val mismatches = docs.filter(size(col("words")) >= k)
        .select(KGrams(col("words"), k).as("native"),
          composedKgrams(col("words"), k).as("composed"))
        .filter(not(col("native") <=> col("composed")))
        .count()
      assert(mismatches === 0, s"k=$k")
    }
  }

  test("edge cases: short arrays, exact-length, null words") {
    val df = Seq(
      (1L, Seq("a", "b")),            // shorter than k -> empty
      (2L, Seq("a", "b", "c")),       // exactly k -> one gram
      (3L, Seq("a", "b", "c", "d"))). // two grams
      toDF("id", "words")
    val rows = df.select(col("id"), KGrams(col("words"), 3).as("g"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[String](1) === Seq.empty)
    assert(rows(1).getSeq[String](1) === Seq("a b c"))
    assert(rows(2).getSeq[String](1) === Seq("a b c", "a b c d".split(" ").drop(1).mkString(" ")))
    // a null word nulls exactly the grams containing it (concat propagation)
    val withNull = Seq(Seq("a", null, "c", "d", "e")).toDF("words")
      .select(KGrams(col("words"), 3).as("g"),
        composedKgrams(col("words"), 3).as("c"))
      .collect()(0)
    assert(withNull.getSeq[String](0) === withNull.getSeq[String](1))
    assert(withNull.getSeq[String](0) === Seq(null, null, "c d e"))
  }

  test("interpreted eval matches codegen output") {
    val df = Seq(Seq("a", "b", "c", "d", "e")).toDF("words")
    val viaCodegen = df.select(KGrams(col("words"), 3)).collect()
    val viaEval = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val e = KGramsExpr(ColumnBridge.expression(col("words")), 3)
      df.select(ColumnBridge.column(e)).collect()
    }
    assert(viaCodegen.map(_.getSeq[String](0)).toSeq ===
      viaEval.map(_.getSeq[String](0)).toSeq)
  }
}
