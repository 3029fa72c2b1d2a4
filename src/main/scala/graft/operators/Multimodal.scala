package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via a partition-batched typed
  * pipeline (north-star extension).
  *
  * The Spark-side plumbing is real — BinaryType payload column, case-class
  * schema through `Dataset[T]` encoders, `mapPartitions` batch iteration
  * (the JVM analogue of a vectorized/batched decode UDF, so a real decoder
  * amortizes model/codec init per partition, not per row).
  *
  * Codec status: IMAGE and AUDIO decode are REAL — javax.imageio PNG
  * (encode / decode / nearest-neighbor resize / re-encode, x44/x50) and
  * javax.sound.sampled WAV (RIFF parse + PCM frame fold, x51), both in
  * the JDK. Only VIDEO remains a clearly-marked deterministic stub
  * (`decodeStub`, used by the x10/x33 synthetic-modality pipeline): no
  * video codec ships with the JDK; swap in an ffmpeg JNI binding without
  * touching the pipeline.
  */
object Multimodal {

  final case class MediaIn(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, mime: String, n_bytes: Long,
                             width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake standing in for a codec call.
    * Metadata is pure arithmetic over payload length so the DuckDB oracle
    * can verify the pipeline end-to-end. */
  def decodeStub(m: MediaIn): MediaMeta = {
    val n = m.payload.length.toLong
    MediaMeta(m.doc_id, m.mime, n,
      width = (16 + n % 1024).toInt,
      height = (16 + (n * 7) % 768).toInt,
      n_frames = (1 + n % 5).toInt)
  }

  /** documents → media table: payload = utf8 bytes of `text`, synthetic
    * modality by doc_id (the fixture has no real media column). */
  def mediaTable(docs: DataFrame): Dataset[MediaIn] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      col("text").cast("binary").as("payload"))
      .as[MediaIn]
  }

  /** The decode stage: partition-batched map keeping the typed schema. */
  def decode(media: Dataset[MediaIn]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // Real decoders initialize codecs HERE, once per partition batch.
      it.map(decodeStub)
    }
  }

  /** Frame-sampling stage: k evenly-spaced frame indices per media row —
    * `floor(j·n_frames/k)` for j in 0..k-1, the standard decimation grid.
    * The index arithmetic (and the array plumbing) is real; extracting the
    * frames AT those indices is the codec call, stubbed like `decodeStub`.
    * Indices surface as a comma-joined string so the oracle compares
    * scalars, not nested arrays. */
  def sampleFrames(meta: Dataset[MediaMeta], k: Int): DataFrame =
    meta.toDF().withColumn("frame_idx",
      concat_ws(",", transform(sequence(lit(0), lit(k - 1)),
        j => floor(j * col("n_frames") / k).cast("int"))))

  // --- Real image codec path (javax.imageio — in the JDK, no external
  // libs): PNG encode/decode round-trip. `decodeStub` remains the honest
  // stand-in for audio/video (no codecs in this container); images get the
  // real thing: `decodePng` parses actual PNG bytes — IHDR dimensions,
  // zlib-inflated scanlines — via ImageIO.

  final case class PngIn(doc_id: Long, mime: String, png: Array[Byte])
  final case class PngMeta(doc_id: Long, mime: String, width: Int, height: Int,
                           px_sum: Long, ok_sig: Int)

  /** Deterministic grayscale test image for `doc_id`: w=1+id%16,
    * h=1+id%8, sample(x,y) = (id·31 + x·7 + y) mod 256. Closed-form, so
    * the DuckDB oracle can state the expected DECODED metadata without
    * ever seeing the bytes. */
  private def fixturePixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y) % 256).toInt

  /** Encode one real PNG per selected doc (partition-batched; ImageIO
    * writer state is per-thread). Raster samples are written/read
    * directly (TYPE_BYTE_GRAY) — no color-space conversion, so the
    * encode→decode round-trip is sample-exact. */
  def encodePng(docs: DataFrame): Dataset[PngIn] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { id =>
        val w = (1 + id % 16).toInt
        val h = (1 + id % 8).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, fixturePixel(id, x, y)); x += 1 }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        PngIn(id, "image/png", out.toByteArray)
      }
    }
  }

  /** REAL decode: parse the PNG container (signature check + full pixel
    * decode via ImageIO) and derive metadata from the decoded raster —
    * width/height from IHDR, px_sum from the inflated scanlines. This is
    * the production shape for image corpora: opaque binary column in,
    * typed metadata out, codec init amortized per partition. */
  def decodePng(media: Dataset[PngIn]): Dataset[PngMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { m =>
        val sig = m.png.length >= 8 &&
          (m.png(0) & 0xFF) == 0x89 && m.png(1) == 'P' && m.png(2) == 'N' && m.png(3) == 'G'
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.png))
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        PngMeta(m.doc_id, m.mime, img.getWidth, img.getHeight, sum, if (sig) 1 else 0)
      }
    }
  }

  // --- Real audio codec path (javax.sound.sampled — also in the JDK):
  // WAV encode/decode round-trip. PCM samples are deterministic
  // arithmetic, so the oracle states the DECODED sample sum, frame count
  // and format in closed form; decode parses the actual RIFF container.

  final case class WavIn(doc_id: Long, wav: Array[Byte])
  final case class WavMeta(doc_id: Long, sample_rate: Int, channels: Int,
                           n_samples: Long, sample_sum: Long, ok_riff: Int)

  /** Deterministic 16-bit mono PCM fixture for `doc_id`:
    * n = 64 + id%128 samples at 8 kHz, sample i = (id·7 + i·13) mod 2003
    * − 1001 (signed, well inside 16-bit range). */
  private def fixtureSample(id: Long, i: Int): Short =
    ((id * 7 + i * 13) % 2003 - 1001).toShort

  /** Encode one real WAV (RIFF/WAVE container) per selected doc. */
  def encodeWav(docs: DataFrame): Dataset[WavIn] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (64 + id % 128).toInt
        val data = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = fixtureSample(id, i)
          data(2 * i) = (s & 0xFF).toByte           // little-endian PCM
          data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        WavIn(id, out.toByteArray)
      }
    }
  }

  /** REAL decode: parse the RIFF container (signature + fmt chunk via
    * AudioSystem) and fold the actual PCM frames back into metadata —
    * format, frame count, and the little-endian signed-sample sum. */
  def decodeWav(media: Dataset[WavIn]): Dataset[WavMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val b = m.wav
        val riff = b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val pcm = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i + 1 < pcm.length) {
          sum += (((pcm(i + 1) & 0xFF) << 8) | (pcm(i) & 0xFF)).toShort
          i += 2
        }
        WavMeta(m.doc_id, fmt.getSampleRate.toInt, fmt.getChannels, frames,
          sum, if (riff) 1 else 0)
      }
    }
  }

  final case class PngResized(doc_id: Long, src_w: Int, src_h: Int,
                              width: Int, height: Int, px_sum: Long,
                              ok_reencode: Int)

  /** REAL resize stage: decode the PNG, nearest-neighbor downsample the
    * raster to (tw, th) — target (x,y) reads source
    * (⌊x·sw/tw⌋, ⌊y·sh/th⌋), the deterministic decimation every image
    * pipeline starts from — then RE-ENCODE the resized image to PNG
    * (`ok_reencode` checks the new container's signature, proving the
    * full decode→transform→encode loop, not just a read). The index
    * arithmetic is integer-exact, so the oracle states the resized
    * pixel sum in closed form without seeing any bytes. */
  def resizePng(media: Dataset[PngIn], tw: Int, th: Int): Dataset[PngResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { m =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.png))
        val (sw, sh) = (img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val src = img.getRaster
        val dst = out.getRaster
        var sum = 0L
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val v = src.getSample(x * sw / tw, y * sh / th, 0)
            dst.setSample(x, y, 0, v)
            sum += v
            x += 1
          }
          y += 1
        }
        val bytes = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bytes)
        val b = bytes.toByteArray
        val sig = b.length >= 8 && (b(0) & 0xFF) == 0x89 &&
          b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
        PngResized(m.doc_id, sw, sh, tw, th, sum, if (sig) 1 else 0)
      }
    }
  }

  /** Per-modality stats over decoded metadata. */
  def modalityStats(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().groupBy("mime")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(col("n_frames").cast("long")).as("sum_frames"))
}
