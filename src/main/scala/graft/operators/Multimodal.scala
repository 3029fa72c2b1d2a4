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
  * amortizes model/codec init per partition, not per row). The decode
  * itself is a clearly-marked deterministic STUB: this container has no
  * image/audio codecs, so it derives metadata arithmetically from the
  * payload bytes. Swap `decodeStub` for a real codec (e.g. javax.imageio /
  * ffmpeg JNI) without touching the pipeline.
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
