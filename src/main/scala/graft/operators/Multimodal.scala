package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * batch-sized iteration, typed output — but the codec itself is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecode`): the sandbox has no
  * image/audio libraries, so "decoding" derives metadata/features purely
  * from the bytes. Swapping in a real codec means replacing `fakeDecode`
  * only; every Spark-facing contract stays identical.
  */
object Multimodal {

  final case class BinaryDoc(doc_id: Long, modality: String, content: Array[Byte])
  final case class DecodedDoc(
      doc_id: Long,
      modality: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      frames: Int,
      features: Array[Float])

  /** Batch size for partition-local decoding — the analogue of a Pandas
    * UDF's arrow batch: codecs amortize setup across a batch, not a row.
    */
  val decodeBatchSize = 64

  /** Synthesize binary docs from the documents table (utf-8 bytes as the
    * opaque payload; modality round-robins by doc_id).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"))

  /** STUB codec — deterministic function of the payload bytes only.
    * A real implementation would dispatch on modality to an actual
    * decoder here (JPEG dims, PCM duration, container frame count).
    */
  private def fakeDecode(modality: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 64 + n % 576
    val height = 64 + (n * 7) % 416
    val frames = if (modality == "video") 1 + n % 30 else 1
    // "features": mean byte value per 16-byte stripe, first 8 stripes
    val features = Array.tabulate(math.min(8, math.max(1, n / 16))) { i =>
      val s = bytes.slice(i * 16, math.min(n, i * 16 + 16))
      if (s.isEmpty) 0f else s.map(b => (b & 0xff).toFloat).sum / s.length
    }
    (width, height, frames, features)
  }

  /** Decode binary docs in partition-local batches. Uses mapPartitions
    * with grouped iteration — the batch shape a real codec needs — and
    * never materializes a partition in memory.
    */
  def decode(spark: SparkSession, binaryDocs: DataFrame): Dataset[DecodedDoc] = {
    import spark.implicits._
    binaryDocs.as[BinaryDoc].mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // (a real codec would init once per batch here)
        batch.iterator.map { d =>
          val (w, h, f, feats) = fakeDecode(d.modality, d.content)
          DecodedDoc(d.doc_id, d.modality, d.content.length, w, h, f, feats)
        }
      }
    }
  }
}
