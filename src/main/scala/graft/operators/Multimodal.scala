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
}
