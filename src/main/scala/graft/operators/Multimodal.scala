package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque binary payloads + typed
  * metadata, with batched per-partition decode plumbing.
  *
  * The decode itself is STUBBED (no image/audio libs in this
  * container): `FakeDecoder` derives deterministic pseudo-metadata
  * and a small feature vector from the payload's md5. Everything
  * around it — binary column handling, schema, the
  * mapPartitions-with-batching shape a real (native-lib) decoder
  * needs, partition sizing — is real Spark and tested in
  * MultimodalSpec.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, n_bytes: Long, media_type: String,
                              width: Int, height: Int, frames: Int,
                              features: Array[Float])

  val BatchSize = 64

  /** STUB decoder: a real implementation would hand each batch of
    * payloads to a native decoder (libjpeg/ffmpeg/...) — batching
    * amortizes per-call setup; this fake derives everything from
    * md5(payload) so results are deterministic and schema-complete.
    */
  object FakeDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] = batch.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
      val h = java.lang.Long.parseLong(md.take(6).map("%02x".format(_)).mkString, 16)
      val n = r.payload.length.toLong
      DecodedRow(
        doc_id = r.doc_id,
        n_bytes = n,
        media_type = (n % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        },
        width = (h % 640 + 1).toInt,
        height = (h % 480 + 1).toInt,
        frames = (n % 30 + 1).toInt,
        features = Array.tabulate(8)(i => ((h >> (i * 6)) % 997).toFloat / 997f))
    }
  }

  /** documents.text cast to a binary payload column — the stand-in
    * media table (no binary test fixture ships in testdata).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode: one partition = one iterator, grouped into
    * BatchSize chunks (the shape a vectorized/native decoder wants).
    * Narrow transform — no shuffle; scales with input partitions.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(FakeDecoder.decodeBatch))
  }

  final case class ResizedRow(doc_id: Long, width: Int, height: Int,
                              target_w: Int, target_h: Int, scale: Double)

  /** Resize planning: aspect-preserving fit into a target box. The
    * arithmetic is the real operator; only pixel resampling is
    * stubbed out with the decoder. Narrow, codegen-free batch pass.
    */
  def resize(decoded: Dataset[DecodedRow], maxW: Int, maxH: Int): Dataset[ResizedRow] = {
    import decoded.sparkSession.implicits._
    decoded.map { r =>
      val s = math.min(1.0, math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
      ResizedRow(r.doc_id, r.width, r.height,
        math.max(1, math.floor(r.width * s).toInt),
        math.max(1, math.floor(r.height * s).toInt), s)
    }
  }

  /** Deterministic frame sampling: k evenly-spaced frame indices of
    * an n-frame clip (the standard video subsample for captioning /
    * embedding) — index i ↦ ⌊i·n/k⌋, no randomness to coordinate.
    */
  def sampleFrameIndices(nFrames: Int, k: Int): Seq[Int] = {
    require(k >= 1)
    if (nFrames <= 0) Seq.empty
    else (0 until math.min(k, nFrames)).map(i => (i.toLong * nFrames / math.min(k, nFrames)).toInt)
  }

  final case class FrameRow(doc_id: Long, frame_index: Int)

  def frameSample(decoded: Dataset[DecodedRow], k: Int): Dataset[FrameRow] = {
    import decoded.sparkSession.implicits._
    decoded.flatMap(r => sampleFrameIndices(r.frames, k).map(FrameRow(r.doc_id, _)))
  }
}
