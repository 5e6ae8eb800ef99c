package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain groupBy for count/sum on a skewed key") {
    // 10k rows of one hot key + a tail
    val hot = Seq.fill(10000)(("hot", 1.0))
    val tail = (1 to 100).map(i => (s"k$i", i.toDouble))
    val df = (hot ++ tail).toDF("k", "v")
    val salted = Skew.saltedAgg(df, col("k"), 16,
      Seq(count(lit(1)).as("ct"), sum(col("v")).as("amt")),
      Seq(sum(col("ct")).as("ct"), sum(col("amt")).as("amt")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = df.groupBy("k").agg(count(lit(1)).as("ct"), sum("v").as("amt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted === plain)
    assert(salted("hot")._1 === 10000L)
  }

  test("saltedAgg handles MapType columns (hash-on-map is illegal)") {
    // hash() rejects MapType under spark.sql.legacy.allowHashOnMapType=false
    // — the salt must canonicalize maps instead of failing analysis
    val hot = Seq.fill(500)(("hot", 1.0, Map("a" -> "1", "b" -> "2")))
    val tail = (1 to 10).map(i => (s"k$i", i.toDouble, Map("c" -> s"$i")))
    val df = (hot ++ tail).toDF("k", "v", "attrs")
    val salted = Skew.saltedAgg(df, col("k"), 8,
      Seq(count(lit(1)).as("ct"), sum(col("v")).as("amt")),
      Seq(sum(col("ct")).as("ct"), sum(col("amt")).as("amt")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted("hot") === (500L, 500.0))
    assert(salted("k3") === (1L, 3.0))
  }

  test("salted join replication preserves join results") {
    val big = Seq.fill(1000)(("hot", 1)).++((1 to 20).map(i => (s"k$i", i))).toDF("k", "v")
    val small = Seq(("hot", "H"), ("k1", "A")).toDF("k", "name")
    val plain = big.join(small, "k").count()
    val saltedJoin = Skew.saltBigSide(big, 8)
      .join(Skew.replicateSmallSide(small, 8), Seq("k", "_salt"))
      .count()
    assert(saltedJoin === plain)
  }

  test("paymentWide streaming interval join honors [-15m, +5m] (J2)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val pay = MemoryStream[(Long, Long, Long)] // id, order_id, callback_ts
    val ow = MemoryStream[(Long, String, Long)] // order_id, create_time, create_ts
    val joined = graft.streaming.WideJoins.paymentWide(
      pay.toDF().toDF("id", "order_id", "callback_ts"),
      ow.toDF().toDF("order_id", "create_time", "create_ts"))
    val q = joined.writeStream.format("memory").queryName("payment_wide")
      .outputMode("append").start()
    try {
      val t = 3600000L // payment callback at t
      pay.addData((1L, 100L, t), (2L, 200L, t))
      ow.addData(
        (100L, "in-bound-10m-before", t - 600000L),
        (200L, "out-of-bound-20m-before", t - 1200000L))
      q.processAllAvailable()
      val got = spark.table("payment_wide").select("order_create_time")
        .collect().map(_.getString(0)).toSet
      assert(got === Set("in-bound-10m-before"), got)
    } finally q.stop()
  }
}
