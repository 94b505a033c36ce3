package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * are opaque `binary` columns with typed metadata; decode / feature
  * extraction / frame sampling run as partition-local typed operators.
  *
  * The actual codec step is STUBBED (this environment has no image/audio
  * libraries): `fakeDecode` derives a deterministic feature vector from the
  * bytes. Everything around it — the binary schema, the `Dataset[T]`
  * encoder plumbing, `mapPartitions` batch shape (one codec init per
  * partition, streamed rows), and the chunk/frame explode — is real and is
  * what a production pipeline reuses when the codec lands.
  */
object MultimodalOps {

  /** A media row: payload + typed metadata (the reference models media as
    * RAW/BYTES columns the same way).
    */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String,
      n_bytes: Long)

  case class MediaFeatures(media_id: Long, n_bytes: Long, head_byte: Long,
      checksum: Long, feature: Array[Double])

  /** Wrap a text corpus as binary media rows (payload = utf-8 bytes). */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "utf-8").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(encode(col("text"), "utf-8")).cast(LongType).as("n_bytes"))
      .as[MediaRow]
  }

  /** Partition-local "decode + featurize". One codec init per partition,
    * then a streamed per-row decode — the batch shape a real
    * image/audio codec needs. The decode itself is a deterministic fake:
    * byte-sum checksum mod 2^31-1 and an 4-dim feature from byte stats.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // [codec init would happen here, once per partition]
      rows.map { r =>
        val bytes = r.payload
        val checksum = bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 2147483647L)
        val feature = fakeDecode(bytes)
        MediaFeatures(r.media_id, r.n_bytes,
          if (bytes.isEmpty) -1L else (bytes(0) & 0xff).toLong, checksum, feature)
      }
    }
  }

  /** STUB: stands in for a real image/audio decoder. Deterministic byte
    * statistics with the same shape (fixed-length Array[Double]) a real
    * embedding/feature extractor would return.
    */
  private def fakeDecode(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
    val n = bytes.length
    var sum = 0L; var min = 255; var max = 0
    bytes.foreach { b => val v = b & 0xff; sum += v; if (v < min) min = v; if (v > max) max = v }
    Array(n.toDouble, sum.toDouble / n, min.toDouble, max.toDouble)
  }

  case class MediaResample(media_id: Long, sample: Array[Long])

  /** Resize/resample plumbing — the fixed-output-dimension analogue of an
    * image resize (nearest-neighbor): the payload's n bytes downsample to
    * `target` values at source index floor(i·n/target). Same typed
    * `mapPartitions` batch shape as [[decodeFeatures]] (codec init per
    * partition, streamed rows); a real image library replaces the byte
    * indexing with pixel interpolation, the plumbing stays.
    */
  def resample(media: Dataset[MediaRow], target: Int = 16): Dataset[MediaResample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // [codec init would happen here, once per partition]
      rows.map { r =>
        val n = r.payload.length
        val s = Array.tabulate(target) { i =>
          if (n == 0) -1L
          else (r.payload((i.toLong * n / target).toInt) & 0xff).toLong
        }
        MediaResample(r.media_id, s)
      }
    }
  }

  /** Frame/chunk sampling plumbing: split a payload into fixed-size chunks
    * (≈ video frame extraction / audio windowing), one output row per
    * chunk, chunk id + a deterministic chunk digest. Pure Catalyst —
    * explode of substrings — so it scales as a Generate, no UDF.
    */
  def sampleChunks(docs: DataFrame, chunkChars: Int = 64): DataFrame = {
    // chunk count = ceil(length / chunkChars); an empty payload yields ZERO
    // chunks (guarded explicitly — Long division truncates toward zero, so
    // the naive floor((length-1)/n) form would emit one empty chunk, while
    // the SQL oracle's floor rounds toward -inf and emits none).
    val nChunks = ceil(length(col("text")).cast(DoubleType) / chunkChars).cast(LongType)
    docs
      .select(
        col("doc_id").as("media_id"),
        col("text"),
        explode(when(nChunks <= 0L, array().cast("array<bigint>"))
          .otherwise(sequence(lit(0L), nChunks - 1L)))
          .as("chunk_id"))
      .select(
        col("media_id"), col("chunk_id"),
        col("text").substr((col("chunk_id") * chunkChars + 1).cast(IntegerType),
          lit(chunkChars)).as("chunk"))
      .select(
        col("media_id"), col("chunk_id"),
        length(col("chunk")).cast(LongType).as("chunk_len"),
        md5(col("chunk")).as("chunk_digest"))
  }
}
