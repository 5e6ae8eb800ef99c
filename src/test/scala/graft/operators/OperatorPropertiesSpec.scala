package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariant checks for the newest operators over generated inputs. */
class OperatorPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed)).get

  test("asOf preserves every left row exactly once for random histories") {
    val histGen = for {
      nKeys <- Gen.chooseNum(1, 5)
      rows <- Gen.listOfN(12, for {
        k <- Gen.chooseNum(1, nKeys)
        v <- Gen.chooseNum(0L, 100L)
        tag <- Gen.alphaLowerStr.map(_.take(4))
      } yield (k.toLong, tag, v))
    } yield rows
    val factGen = Gen.listOfN(20, for {
      k <- Gen.chooseNum(1L, 7L)  // includes keys with no history
      ts <- Gen.chooseNum(0L, 120L)
    } yield (k, ts))

    (1L to 3L).foreach { s =>
      val hist = sample(histGen, s).toDF("user_id", "tag", "valid_from")
        .dropDuplicates("user_id", "valid_from") // version key must be unique
      val facts = sample(factGen, s + 100).zipWithIndex
        .map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("fact_id", "user_id", "ts")
      val out = TemporalJoin.asOf(facts, hist, "user_id", "ts", "valid_from")
      assert(out.count() === facts.count(), s"seed $s lost/duplicated facts")
      assert(out.select("fact_id").distinct().count() === facts.count())
      // resolved version never postdates the fact
      assert(out.filter(col("r_valid_from") > col("ts")).count() === 0)
    }
  }

  test("dedupByCluster is idempotent: a second pass removes nothing") {
    val docs = graft.Tables.table(spark, sf, "documents")
    val once = DedupOps.dedupByCluster(docs, 0.9).persist()
    val twice = DedupOps.dedupByCluster(once, 0.9)
    assert(twice.count() === once.count())
  }

  test("ngram jaccard of a doc with itself would be 1: planted adjacent twins") {
    // two adjacent ids with identical text must appear with jaccard 1
    val texts = (0 until 12).map(i => (0 until 40).map(j => s"w${i}_$j").mkString(" "))
    val withTwin = texts.updated(5, texts(4)) // doc 5 = copy of doc 4
    val df = withTwin.zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.replace(" ", "").length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val j = DedupOps.ngramJaccard(df)
      .filter(col("doc_a") === 4 && col("doc_b") === 5)
      .select("jaccard").collect()
    assert(j.length === 1 && j.head.getDouble(0) === 1.0)
  }
}
