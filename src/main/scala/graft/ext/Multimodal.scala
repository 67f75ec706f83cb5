package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal (image/audio/video) column plumbing.
  *
  * Assets travel as opaque `binary` payloads plus typed metadata — the
  * layout a 100 TB training-data pipeline uses so Spark never interprets
  * media bytes in the row pipeline (checksum/length/magic are cheap binary
  * expressions; heavy decode happens batched at partition granularity).
  *
  * The actual codec calls (JPEG decode, audio resample, video frame-sample)
  * are STUBBED with a deterministic md5-derived fake — the media libraries
  * are not in this container — but everything Spark-side is real and tested:
  * the asset schema, the binary expressions, the typed `mapPartitions`
  * batch-decode shape (the JVM twin of `mapInPandas`: one iterator per
  * partition, so a real codec would amortize model/codec init per batch,
  * not per row).
  */
object Multimodal {

  /** One media asset: payload + metadata. Mirrors (asset_id, modality,
    * bytes, meta) with decode products nullable until [[decodePartitions]].
    */
  final case class Asset(
      asset_id: Long,
      modality: String,
      payload: Array[Byte],
      source: String)

  final case class DecodedAsset(
      asset_id: Long,
      modality: String,
      source: String,
      n_bytes: Long,
      checksum: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Cheap metadata over the raw binary column — no decode, pure codegen:
    * byte length, md5 checksum, leading-bytes "magic" hex. This is the scan
    * path a filter like "drop assets > 10 MB / wrong magic" pushes into.
    */
  def withBinaryMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("checksum", md5(col(payloadCol)))
      .withColumn("magic", hex(substring(col(payloadCol), 1, 4)))

  /** Deterministic fake decode used by the stub: dimensions and a small
    * feature vector derived from the payload checksum. A real deployment
    * replaces `fakeDecode` with the codec call; nothing else changes.
    */
  private[ext] def fakeDecode(a: Asset): DecodedAsset = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(a.payload)
    val hex = md.map("%02x".format(_)).mkString
    def byteAt(i: Int): Int = java.lang.Integer.parseInt(hex.substring(i, i + 2), 16)
    val feature = (0 until 8).map(i => byteAt(i * 2) / 255.0f).toArray
    DecodedAsset(
      a.asset_id, a.modality, a.source,
      n_bytes = a.payload.length.toLong,
      checksum = hex,
      width = 64 + byteAt(0) * 4,
      height = 64 + byteAt(2) * 4,
      n_frames = if (a.modality == "video") 1 + byteAt(4) % 64 else 1,
      feature = feature)
  }

  /** Batch decode: one codec context per partition, streamed rows.
    * `mapPartitions` (not `map`) is the load-bearing choice — a real
    * decoder initializes once per task and processes the partition as a
    * batch, exactly like `mapInPandas` batches on the Python side.
    */
  def decodePartitions(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val codec = Codec.open(); it.map(a => codec.decode(a))
      it.map(fakeDecode)
    }
  }

  /** The documents table re-cast as a binary asset corpus — the stand-in
    * media source for tests and declared queries (text bytes as payload).
    */
  def documentAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.io.Tables.testTable(spark, sfDir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[Asset]
  }
}
