package graft.operators

import graft.Tables.table
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A raw media record: opaque bytes + typed metadata — the multimodal column
  * convention (image/audio/video as `binary` with a sidecar struct).
  */
case class MediaRecord(doc_id: Long, mime: String, content: Array[Byte])

/** Decoded media features. Width/height/frames come from the (stubbed)
  * decoder; byte_len is real.
  */
case class MediaFeatures(doc_id: Long, mime: String, byte_len: Long,
    width: Int, height: Int, n_frames: Int)

/** Multimodal column plumbing: binary payloads with typed metadata, decoded
  * per-partition in batches.
  *
  * The decode step is a STUB (no image/audio codecs in this container): a
  * deterministic fake derives dimensions from the payload hash. The Spark-side
  * plumbing is real and is the part that must hold at 100 TB — binary columns
  * stay columnar in parquet, `mapPartitions` amortizes decoder init per
  * partition (the idiomatic Scala analog of a batched pandas UDF), and
  * partition sizing is controlled upstream by files.maxPartitionBytes so a
  * partition of blobs fits executor memory.
  */
object MultimodalOps {

  /** Deterministic fake decoder — replace with a real codec binding. */
  private[operators] def fakeDecode(m: MediaRecord): MediaFeatures = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(m.content)
    def u(i: Int): Int = d(i) & 0xff
    MediaFeatures(m.doc_id, m.mime, m.content.length.toLong,
      width = 64 + (u(0) * 256 + u(1)) % 1984,
      height = 64 + (u(2) * 256 + u(3)) % 1984,
      n_frames = if (m.mime.startsWith("video")) 1 + u(4) % 240 else 1)
  }

  /** Attach a binary payload column (documents.text as UTF-8 bytes stands in
    * for real media blobs) + mime metadata.
    */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(col("doc_id"),
        concat(lit("image/fake-"), col("source")).as("mime"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** M1 — decode/feature-extract over binary columns. `mapPartitions` so a
    * real decoder would init once per partition and process a batch.
    */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, dir)
      .mapPartitions(_.map(fakeDecode))
      .toDF()
  }

  /** M2 — frame sampling: one output row per sampled frame (every `everyN`th
    * of `n_frames`), the flatMap shape a video pipeline needs. Frame bytes
    * are the stubbed decoder's output (`???`-equivalent: deterministic fake);
    * the row fan-out, schema, and partition behavior are the real thing.
    */
  def sampleFrames(spark: SparkSession, dir: String, everyN: Int): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, dir)
      .mapPartitions { it =>
        it.flatMap { m =>
          val f = fakeDecode(m)
          (0 until f.n_frames by everyN).map { i =>
            (m.doc_id, i, f.width, f.height,
              // STUB: a real codec would decode frame i; fake = hash slice
              java.util.Arrays.copyOfRange(m.content, 0,
                math.min(16, m.content.length)))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "frame_bytes")
  }

  /** M3 — resize: metadata-level transform (target dims + scale factors
    * computed in-plan; the pixel work is the stubbed decode step). Shows the
    * pattern: cheap columnar math stays in Catalyst, only the opaque codec
    * call crosses into mapPartitions.
    */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame =
    features
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
}
