package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct riding alongside. The
  * Spark-side plumbing — schema, batch iteration, partition-local
  * feature extraction — is real and tested; only the codec itself is a
  * clearly-marked deterministic stub (no image/audio libraries exist in
  * this container).
  */
object Multimodal {

  /** Canonical asset schema: `(doc_id, payload binary, meta struct)`. */
  val AssetSchema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("payload", BinaryType, nullable = true)
    .add("meta", new StructType()
      .add("format", StringType)
      .add("n_bytes", IntegerType)
      .add("source", StringType))

  /** Wrap a text table into assets: UTF-8 payload bytes + metadata
    * struct. In production the payload column arrives from the lakehouse
    * as real image/audio bytes; the construction here only exercises the
    * binary plumbing. */
  def toAssets(df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("format"),
        length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** Pure-expression stats over the binary payload (codegen'd; no UDF):
    * byte length and content digest. */
  def assetStats(assets: DataFrame): DataFrame =
    assets.select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("digest"))

  /** Decoded per-asset features. */
  final case class AssetFeatures(
      doc_id: Long, n_bytes: Int, mean_byte: Double, feature_crc: Long)

  /** Partition-parallel feature extraction over the binary payload —
    * the Scala analogue of a `mapInPandas` batch UDF: one iterator pass
    * per partition, no driver involvement, output schema fixed by the
    * case-class encoder.
    *
    * ==== STUB ====
    * The body below stands in for a real decode (JPEG → pixels, PCM →
    * spectrogram). Image/audio codecs are not available in this
    * container, so features are a deterministic function of the raw
    * bytes (mean byte value + CRC32). Replace the marked block with the
    * real codec; the surrounding plumbing does not change.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // === STUB decode: replace with the real codec ===
          val safe = if (bytes == null) Array.empty[Byte] else bytes
          val mean =
            if (safe.isEmpty) 0.0
            else safe.map(_ & 0xFF).sum.toDouble / safe.length
          val crc = new java.util.zip.CRC32()
          crc.update(safe)
          AssetFeatures(id, safe.length, mean, crc.getValue)
          // === end STUB ===
        }
      }
      .toDF()
  }

  /** Batch-shaped feature extraction — the Scala analogue of
    * `mapInPandas`: rows are grouped into size-`batchSize` batches
    * within each partition and the (stub) codec is invoked ONCE per
    * batch, the shape vectorized decoders need (a real image model
    * wants a tensor of N images per call, not N calls). Output rows
    * stay 1:1 with input rows; only the call granularity changes. */
  def extractFeaturesBatched(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // === STUB batch decode: one call per batch of payloads ===
          batch.map { case (id, bytes) =>
            val safe = if (bytes == null) Array.empty[Byte] else bytes
            val mean =
              if (safe.isEmpty) 0.0
              else safe.map(_ & 0xFF).sum.toDouble / safe.length
            val crc = new java.util.zip.CRC32()
            crc.update(safe)
            AssetFeatures(id, safe.length, mean, crc.getValue)
          }
          // === end STUB ===
        }
      }
      .toDF()
  }

  /** One sampled frame of a video/audio payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: each payload fans out to `nFrames` evenly-spaced
    * slices (one output row per frame), the partition-parallel shape of
    * video frame extraction — the fan-out happens on the executors, the
    * frame rows shuffle-partition independently of their source asset.
    *
    * ==== STUB ====
    * A real implementation seeks to container keyframes; here a frame is
    * a deterministic byte-range slice of the payload.
    */
  def sampleFrames(assets: DataFrame, nFrames: Int = 4): DataFrame = {
    require(nFrames > 0, "nFrames must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val safe = if (bytes == null) Array.empty[Byte] else bytes
          if (safe.isEmpty) Iterator.empty
          else {
            // === STUB frame seek: evenly-spaced byte slices ===
            val span = math.max(1, safe.length / nFrames)
            (0 until math.min(nFrames, safe.length)).iterator.map { i =>
              val from = i * span
              val until = math.min(safe.length, from + span)
              Frame(id, i, java.util.Arrays.copyOfRange(safe, from, until))
            }
            // === end STUB ===
          }
        }
      }
      .toDF()
  }
}
