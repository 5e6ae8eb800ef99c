package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_f matches the aggregate/zip_with fold bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.7f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot_f(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("fold"))
    got.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(got.head.getDouble(0) === 32.0)
  }

  test("dot_f nulls propagate; wrong types rejected at analysis") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    val r = df.select(VectorFunctions.dot_f(col("a"), col("b"))).head
    assert(r.isNullAt(0))
    val bad = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      bad.select(VectorFunctions.dot_f(col("a"), col("b"))).collect()
    }
  }

  test("expression participates in whole-stage codegen") {
    val e = graft.Tables.table(spark, sf, "embeddings")
    val plan = e.select(VectorFunctions.dot_f(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in simpleString form
    assert(plan.contains("*(1) Project"), plan)
  }

  test("type check accepts float arrays, rejects others") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val farr = Literal.create(Seq(1.0f), ArrayType(FloatType))
    assert(DotProductF(farr, farr).checkInputDataTypes().isSuccess)
    val iarr = Literal.create(Seq(1), ArrayType(IntegerType))
    assert(!DotProductF(farr, iarr).checkInputDataTypes().isSuccess)
    assert(DotProductF(farr, farr).prettyName === "dot_product_f")
  }
}
