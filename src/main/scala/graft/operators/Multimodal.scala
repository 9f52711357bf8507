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
  /** The stub's frame-count rule, shared by [[decode]], [[frameSample]]
    * and (via text length) the q49 oracle — one definition so the three
    * cannot drift apart.
    */
  private[graft] def frameCount(nBytes: Int): Int = 1 + nBytes % 30

  private def fakeDecode(modality: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 64 + n % 576
    val height = 64 + (n * 7) % 416
    val frames = if (modality == "video") frameCount(n) else 1
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

  final case class ResizedDoc(
      doc_id: Long, modality: String,
      width: Int, height: Int, out_width: Int, out_height: Int,
      content: Array[Byte])

  /** Resize plumbing: same batch shape as [[decode]]; output dims are
    * the aspect-preserving fit into (maxW, maxH). STUB resample: keeps
    * every k-th byte (k = area ratio) — a real implementation swaps the
    * body for an actual scaler; row count, schema, and the 1:1 doc
    * mapping are the Spark-side contract and stay identical.
    */
  def resize(spark: SparkSession, binaryDocs: DataFrame,
             maxW: Int = 224, maxH: Int = 224): Dataset[ResizedDoc] = {
    import spark.implicits._
    binaryDocs.as[BinaryDoc].mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.map { d =>
          val (w, h, _, _) = fakeDecode(d.modality, d.content)
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val k = math.max(1, (w.toLong * h / math.max(1L, ow.toLong * oh)).toInt)
          // every-k-th byte via a stepped primitive loop: O(n/k) byte
          // writes, no boxing (an indices.collect scan would do O(n)
          // boxed work per row on this hot mapPartitions path)
          val out = new Array[Byte]((d.content.length + k - 1) / k)
          var i = 0
          while (i < out.length) { out(i) = d.content(i * k); i += 1 }
          ResizedDoc(d.doc_id, d.modality, w, h, ow, oh, out)
        }
      }
    }
  }

  final case class FrameSample(
      doc_id: Long, frame_idx: Int, n_frames: Int, frame_bytes: Array[Byte])

  /** Frame sampling for video payloads: one output row per every-Nth
    * frame — the row-expanding shape (flatMap inside the partition
    * batches) a real container demuxer needs. STUB framing: the payload
    * splits into `frames` equal strides (remainder to the last frame),
    * with `frames` the same deterministic count [[decode]] reports. All
    * frame geometry is integer arithmetic, so the q49 oracle reproduces
    * the metadata bit-for-bit from the text length.
    */
  def frameSample(spark: SparkSession, binaryDocs: DataFrame,
                  every: Int = 2): Dataset[FrameSample] = {
    require(every >= 1, s"every must be >= 1, got $every")
    import spark.implicits._
    binaryDocs.as[BinaryDoc].mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator
          .filter(_.modality == "video")
          .flatMap { d =>
            val n = d.content.length
            val frames = frameCount(n)
            val stride = math.max(1, n / frames)
            (0 until frames by every).iterator.map { i =>
              val end = if (i == frames - 1) n else math.min(n, (i + 1) * stride)
              FrameSample(d.doc_id, i, frames, d.content.slice(i * stride, end))
            }
          }
      }
    }
  }
}
