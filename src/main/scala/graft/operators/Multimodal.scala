package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque binary payloads + typed
  * metadata, with batched per-partition decode plumbing.
  *
  * IMAGE decode is REAL (r5): [[ImageIoDecoder]] decodes PNG/JPEG/
  * BMP bytes through javax.imageio (in the JDK, no external libs)
  * and extracts true dimensions + a quadrant-mean feature vector;
  * [[pngTable]] renders deterministic PNGs so the path is exercised
  * end-to-end on genuine image bytes. AUDIO/VIDEO decode stays
  * STUBBED (`FakeDecoder`, honest md5-derived pseudo-metadata — no
  * ffmpeg-class libs in this container); undecodable payloads fall
  * back to the stub flagged media_type="undecodable". Everything
  * around the decoders — binary column handling, schema, the
  * mapPartitions-with-batching shape a native decoder wants,
  * partition sizing — is identical for both paths and spec-tested.
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

  /** REAL image decode via javax.imageio (in the JDK — no external
    * libs): width/height/band-count and a 2x2-quadrant mean-intensity
    * feature vector come from actually decoding the PNG/JPEG/BMP
    * bytes. Same batched mapPartitions shape as the stub path;
    * payloads ImageIO cannot decode (audio/video — still lib-blocked
    * in this container) fall back to [[FakeDecoder]], flagged by
    * media_type so callers can split real from stubbed downstream.
    */
  object ImageIoDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] = batch.map { r =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: java.io.IOException => null }
      if (img == null)
        FakeDecoder.decodeBatch(Seq(r)).head.copy(media_type = "undecodable")
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        // quadrant mean intensities (gray of the RGB packed pixel),
        // normalized to [0,1] — a tiny real feature extractor
        val feats = for {
          qy <- 0 until 2; qx <- 0 until 2
        } yield {
          var sum = 0.0; var n = 0
          var y = qy * h / 2
          while (y < (qy + 1) * h / 2) {
            var x = qx * w / 2
            while (x < (qx + 1) * w / 2) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              n += 1; x += 1
            }
            y += 1
          }
          if (n == 0) 0f else (sum / n / 255.0).toFloat
        }
        DecodedRow(r.doc_id, r.payload.length.toLong, "image",
          w, h, frames = 1, features = feats.toArray)
      }
    }
  }

  /** Batched REAL decode — the javax.imageio twin of [[decode]]. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(ImageIoDecoder.decodeBatch))
  }

  /** Deterministic PNG fixture: renders a doc_id-seeded two-tone
    * image (left/right halves at intensities derived from the id)
    * and encodes it through the real PNG writer — so the decode path
    * is exercised end-to-end on genuine image bytes without any
    * binary test fixture shipping in testdata.
    */
  def syntheticPng(docId: Long, w: Int = 8, h: Int = 6): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val a = ((docId * 37) % 256).toInt; val b = ((docId * 101 + 128) % 256).toInt
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) a else b
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Media table of REAL PNG payloads, one per document row. */
  def pngTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, syntheticPng(id)))
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
