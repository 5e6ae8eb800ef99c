package graft.operators

import graft.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over `documents`:
  * language-ID heuristic, quality scoring, token counting, fingerprinting.
  * Generalizes the reference's tokenizer surface (X1,
  * app/function/SplitFunction.java:12-28 + utils/KeywordUtil.java:14-34).
  *
  * Scale notes: all are per-row narrow transformations (no shuffle at all) of
  * codegen'd string/array functions — they scan-and-project, so at 100 TB they
  * are bandwidth-bound with full column pruning. Thresholds are compared in
  * integer arithmetic so results hash-match any oracle bit-for-bit.
  */
object TextOps {
  private def words(c: Column): Column = split(c, " ")
  // counts surface as BIGINT to match the oracle engine's len()/length()
  private def nWords(w: Column): Column = size(w).cast("long")
  private def stopCt(w: Column): Column =
    size(filter(w, x => x === "the" || x === "a")).cast("long")
  private def charCt(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("long")

  /** T1 — language-ID by n-gram/stopword heuristic. Integer-ratio thresholds:
    * en iff stopword ratio ≥ 8% (25·stop ≥ 2·n), else de iff avg word length
    * ≥ 4.6 (10·chars ≥ 46·n), else unknown.
    */
  def langId(d: DataFrame): DataFrame = {
    val w = words(col("text"))
    d.select(col("doc_id"), nWords(w).as("n_words"), stopCt(w).as("stop_ct"),
        charCt(col("text")).as("char_ct"))
      .withColumn("predicted_lang",
        when(col("stop_ct") * 25 >= col("n_words") * 2, "en")
          .when(col("char_ct") * 10 >= col("n_words") * 46, "de")
          .otherwise("xx"))
  }
  def langId(spark: SparkSession, dir: String): DataFrame =
    langId(table(spark, dir, "documents"))

  /** T2 — quality scoring: length / stopword signals with a small additive
    * score (the punctuation ratio of real corpora degenerates to 0 on this
    * synthetic text; the signal structure is what carries to 100 TB).
    */
  def textQuality(d: DataFrame): DataFrame = {
    val w = words(col("text"))
    d.select(col("doc_id"), col("n_chars"), nWords(w).as("n_words"),
        stopCt(w).as("stop_ct"), charCt(col("text")).as("char_ct"))
      // floor(x*100+0.5)/100: deterministic 2-dp quantization (see DedupOps)
      .withColumn("avg_word_len",
        floor(col("char_ct") * 100.0 / col("n_words") + 0.5) / 100.0)
      .withColumn("quality_score",
        (when(col("n_words") >= 20, 1).otherwise(0) +
         when(col("stop_ct") > 0, 1).otherwise(0) +
         when(col("n_chars") >= 100, 1).otherwise(0)).cast("int"))
  }
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    textQuality(table(spark, dir, "documents"))

  /** T3 — token counting: whitespace tokens + a BPE-ish estimate (chars/4,
    * the published GPT-style rule of thumb), both exact integers.
    */
  def tokenCount(d: DataFrame): DataFrame = {
    d.select(col("doc_id"), col("n_chars"), nWords(words(col("text"))).as("ws_tokens"))
      .withColumn("bpe_tokens", ceil(col("n_chars") / 4.0).cast("long"))
  }
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    tokenCount(table(spark, dir, "documents"))

  /** T4 — document fingerprinting: full-content hash, head-64 hash (rolling
    * prefix), and an order-insensitive hash of the sorted token bag — the three
    * standard near-dup fingerprints.
    */
  def fingerprint(d: DataFrame): DataFrame = {
    d.select(col("doc_id"),
      md5(col("text")).as("fp_full"),
      md5(substring(col("text"), 1, 64)).as("fp_head"),
      md5(concat_ws(" ", array_sort(words(col("text"))))).as("fp_sorted"))
  }
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprint(table(spark, dir, "documents"))

  /** C1 — the end-to-end training-data CURATION pipeline, composed from the
    * family's own stages exactly as a 100 TB corpus run would chain them:
    * exact-dedup keeper selection (d1's min-id-per-content-hash) ∧ language
    * filter (t1, keep 'en') ∧ quality filter (t2, score ≥ 2), then per-doc
    * token accounting (t3) on the survivors.
    *
    * Plan shape: ALL per-doc signals come out of one map-side projection (the
    * lang/quality/token formulas share the split-words subexpression — no
    * repeated scans, no join between t1/t2/t3); the only shuffles are the
    * content-hash groupBy that picks keepers and the doc_id semi-join that
    * applies them — both shuffle-key-balanced, nothing quadratic, so the
    * pipeline is two narrow shuffles regardless of corpus size.
    */
  def curateCorpus(d: DataFrame): DataFrame = {
    val w = words(col("text"))
    val enriched = d.select(col("doc_id"), col("n_chars"),
        nWords(w).as("n_words"), stopCt(w).as("stop_ct"),
        charCt(col("text")).as("char_ct"))
      .withColumn("predicted_lang",
        when(col("stop_ct") * 25 >= col("n_words") * 2, "en")
          .when(col("char_ct") * 10 >= col("n_words") * 46, "de")
          .otherwise("xx"))
      .withColumn("quality_score",
        (when(col("n_words") >= 20, 1).otherwise(0) +
         when(col("stop_ct") > 0, 1).otherwise(0) +
         when(col("n_chars") >= 100, 1).otherwise(0)).cast("int"))
      .withColumn("bpe_tokens", ceil(col("n_chars") / 4.0).cast("long"))
    val keepers = d.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    enriched
      .join(keepers, Seq("doc_id"), "left_semi")
      .filter(col("predicted_lang") === "en" && col("quality_score") >= 2)
      .select("doc_id", "n_words", "quality_score", "bpe_tokens")
  }
  def curateCorpus(spark: SparkSession, dir: String): DataFrame =
    curateCorpus(table(spark, dir, "documents"))
}
