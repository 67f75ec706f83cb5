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
  * The IMAGE and AUDIO codecs are REAL: `javax.imageio` and
  * `javax.sound.sampled` ship in the JDK, so [[decodeImages]] /
  * [[decodeAudio]] (and the image/audio branches of [[decodePartitions]])
  * do actual PNG and WAV/PCM decodes (dimensions, pixel/sample
  * statistics), verified end-to-end by `q_image_meta` / `q_audio_meta`
  * against arithmetic oracles over the synthetic fixtures. Video codecs
  * are absent in the JDK, so that modality (and unparseable payloads)
  * falls back to a documented deterministic md5-derived stand-in
  * ([[derivedDecode]]) — the `mapPartitions` batch shape (the JVM twin of
  * `mapInPandas`: one codec context per partition, streamed rows) is
  * identical either way.
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

  /** Deterministic metadata stand-in for modalities whose codecs are not
    * in this container (audio/video) and for image payloads `ImageIO`
    * cannot parse: dimensions and a small feature vector derived from the
    * payload checksum. A real deployment swaps in the codec call per
    * modality exactly like the image branch already does; nothing else
    * changes.
    */
  private def md5Hex(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString

  private[ext] def derivedDecode(a: Asset): DecodedAsset = {
    val hex = md5Hex(a.payload)
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

  /** Real image decode of one asset, or None when the payload is not a
    * parseable image (including bytes with a valid magic but a corrupt
    * body — ImageIO THROWS on those, it does not return null, so the
    * whole decode is exception-guarded to honor the fallback contract).
    * Emits true dimensions plus an 8-bin histogram of the first band as
    * the feature vector; the bin index clamps at 7 so >8-bit sample
    * depths (e.g. 16-bit grayscale) land in the top bin instead of
    * indexing out of bounds.
    */
  private[ext] def decodeImage(a: Asset): Option[DecodedAsset] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
      if (img == null) None
      else {
        val raster = img.getRaster
        val bins = new Array[Float](8)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            bins(math.min(raster.getSample(x, y, 0) >> 5, 7)) += 1f
            x += 1
          }
          y += 1
        }
        Some(DecodedAsset(
          a.asset_id, a.modality, a.source,
          n_bytes = a.payload.length.toLong,
          checksum = md5Hex(a.payload),
          width = img.getWidth,
          height = img.getHeight,
          n_frames = 1,
          feature = bins))
      }
    } catch { case _: Exception => None }

  /** Raw 8-bit UNSIGNED PCM samples of a WAV payload, or None when the
    * bytes are not parseable WAV or not that exact layout. The encoding
    * check matters: interpreting signed 8-bit PCM with `& 0xFF` would map
    * sample −1 to 255 and silently corrupt the amplitude statistics.
    */
  /** The JVM's registered audio file readers, loaded ONCE.
    * `AudioSystem.getAudioInputStream` re-runs the ServiceLoader provider
    * scan on EVERY call (measured ~5 ms/asset — it dominated the decode
    * pass at corpus scale); this is the same provider list resolved once
    * and probed in order per payload (guide §4.5: heavyweight codec state
    * initializes once, not per row). Decoding still goes through the
    * JDK's real WAV parser.
    */
  @transient private lazy val audioFileReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  private def audioInputStreamOf(payload: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val rs = audioFileReaders
    if (rs.isEmpty) // no providers registered: fall back to the slow path
      return javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
    var i = 0
    while (i < rs.length) {
      try return rs(i).getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
      i += 1
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no registered reader accepts the payload")
  }

  private[ext] def wavSamples(payload: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Int])] =
    try {
      val ais = audioInputStreamOf(payload)
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 8 ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
        None
      else Some((fmt, ais.readAllBytes().map(b => b & 0xFF)))
    } catch { case _: Exception => None }

  /** Real audio decode of one mixed-modality asset: WAV/PCM via the JDK's
    * `javax.sound.sampled`. Emits sample rate / channels / frame count in
    * the generic schema and an 8-bin amplitude histogram as the feature.
    */
  private[ext] def decodeAudioAsset(a: Asset): Option[DecodedAsset] =
    wavSamples(a.payload).map { case (fmt, samples) =>
      val bins = new Array[Float](8)
      samples.foreach(v => bins(v >> 5) += 1f)
      DecodedAsset(
        a.asset_id, a.modality, a.source,
        n_bytes = a.payload.length.toLong,
        checksum = md5Hex(a.payload),
        width = fmt.getSampleRate.toInt,
        height = fmt.getChannels,
        n_frames = samples.length,
        feature = bins)
    }

  /** Batch decode: one codec context per partition, streamed rows.
    * `mapPartitions` (not `map`) is the load-bearing choice — a real
    * decoder initializes once per task and processes the partition as a
    * batch, exactly like `mapInPandas` batches on the Python side. The
    * image and audio branches are REAL JDK decodes (PNG via `javax.imageio`,
    * WAV/PCM via `javax.sound.sampled`); video (and unparseable payloads,
    * e.g. the text-byte test fixtures) takes the deterministic
    * [[derivedDecode]] stand-in.
    */
  def decodePartitions(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition codec init (ImageIO's file-backed stream cache is a
      // per-row temp-file trap under concurrent tasks; disable once here)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val real = a.modality match {
          case "image" => decodeImage(a)
          case "audio" => decodeAudioAsset(a)
          case _ => None
        }
        real.getOrElse(derivedDecode(a))
      }
    }
  }

  /** One image asset (payload IS a real encoded image) and its decoded
    * pixel statistics — the typed schema of the dedicated image path.
    */
  final case class ImageAsset(asset_id: Long, payload: Array[Byte])

  final case class ImageMeta(
      asset_id: Long,
      width: Int,
      height: Int,
      n_pixels: Int,
      pixel_sum: Long,
      pixel_min: Int,
      pixel_max: Int)

  /** Deterministic grayscale PNG: width = 8 + id mod 8, height =
    * 8 + (id div 8) mod 8, gray(x, y) = (id·31 + x·7 + y·13) mod 256.
    * PNG is lossless, so decode recovers these values EXACTLY — which is
    * what makes a real-codec oracle possible: the DuckDB side computes
    * the same statistics arithmetically, never seeing a PNG byte.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id / 8) % 8).toInt
    // hand-assembled minimal PNG (8-bit grayscale, filter 0 per scanline,
    // one zlib-deflated IDAT): `ImageIO.write` pays a writer-SPI lookup +
    // BufferedImage + encoder pipeline per call, which dominated the
    // synthesis pass at corpus scale. The output is a fully conformant
    // PNG — every consumer still runs the real `ImageIO.read` decode and
    // recovers bit-identical pixels (PngSynthSpec pins decode equality).
    val raw = new Array[Byte](h * (w + 1)) // filter byte 0 + row bytes
    var y = 0
    var p = 0
    while (y < h) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < w) {
        raw(p) = ((id * 31 + x * 7 + y * 13) % 256).toByte
        p += 1; x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = defl.deflate(zbuf)
    defl.end()
    val out = new java.io.ByteArrayOutputStream(64 + zlen)
    val crc = new java.util.zip.CRC32()
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length))
      val tb = tag.getBytes("US-ASCII")
      crc.reset(); crc.update(tb); crc.update(body)
      out.write(tb); out.write(body)
      out.write(be32(crc.getValue.toInt))
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'))
    val ihdr = new java.io.ByteArrayOutputStream(13)
    ihdr.write(be32(w)); ihdr.write(be32(h))
    ihdr.write(8) // bit depth
    ihdr.write(0) // color type: grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** The documents table as a corpus of real PNG assets (generated on
    * executors — the encode is itself distributed map work).
    */
  def pngAssets(spark: SparkSession, sfDir: String): Dataset[ImageAsset] = {
    import spark.implicits._
    // synthetic rendering + downstream codec work are CPU-bound: fan a
    // degenerate (single-row-group) scan across the cluster first
    graft.io.Tables.fanOut(
        graft.io.Tables.testTable(spark, sfDir, "documents")
          .select(col("doc_id")), col("doc_id"))
      .as[Long]
      .map(id => ImageAsset(id, syntheticPng(id)))
  }

  /** Dedicated image-decode path: REAL `javax.imageio` PNG decode, one
    * codec context per partition, emitting dimensions + exact pixel
    * statistics. Strict (throws on undecodable payloads) — this path's
    * inputs are by contract real images; the mixed-modality
    * [[decodePartitions]] is the lenient dispatcher.
    */
  def decodeImages(assets: Dataset[ImageAsset]): Dataset[ImageMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"asset ${a.asset_id}: payload is not a decodable image")
        val raster = img.getRaster
        var sum = 0L
        var mn = 255
        var mx = 0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = raster.getSample(x, y, 0)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        ImageMeta(a.asset_id, img.getWidth, img.getHeight,
          img.getWidth * img.getHeight, sum, mn, mx)
      }
    }
  }

  /** Resize output: fixed target dimensions + exact stats of the
    * RESAMPLED pixels, so the oracle replays the nearest-neighbor index
    * arithmetic without touching a PNG byte.
    */
  final case class ResizedMeta(
      asset_id: Long,
      out_w: Int,
      out_h: Int,
      pixel_sum: Long,
      pixel_min: Int,
      pixel_max: Int)

  /** REAL image resize per partition: `javax.imageio` decode, then
    * nearest-neighbor resampling to (outW, outH) — source index
    * `sx = ox·srcW div outW` (pure integer arithmetic, so the transform
    * is engine-replayable, unlike interpolating resizes whose float
    * rounding is implementation-defined). The standard thumbnail /
    * fixed-input-shape step before a vision encoder, as one map pass.
    */
  def resizeImages(assets: Dataset[ImageAsset], outW: Int, outH: Int)
      : Dataset[ResizedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"asset ${a.asset_id}: payload is not a decodable image")
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var mn = 255
        var mx = 0
        var oy = 0
        while (oy < outH) {
          val sy = oy * h / outH
          var ox = 0
          while (ox < outW) {
            val v = raster.getSample(ox * w / outW, sy, 0)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            ox += 1
          }
          oy += 1
        }
        ResizedMeta(a.asset_id, outW, outH, sum, mn, mx)
      }
    }
  }

  /** One ViT-style patch of a resized image: grid position + exact pixel
    * statistics of the patch's resampled pixels.
    */
  final case class PatchMeta(
      asset_id: Long,
      patch_row: Int,
      patch_col: Int,
      pixel_sum: Long,
      pixel_min: Int,
      pixel_max: Int)

  /** ViT-style PATCHIFY: decode, nearest-neighbor resample to the fixed
    * encoder input shape (outW × outH), and split into non-overlapping
    * (patchW × patchH) patches — the `(H/P)·(W/P)` token grid a vision
    * transformer consumes (Dosovitskiy et al., ICLR 2021), as one
    * partition-batched map pass (decode + resample + patch stats touch
    * each pixel once; no shuffle). Source index `sx = ox·srcW div outW`
    * is pure integer arithmetic, so the oracle replays resample AND patch
    * grouping without a PNG byte; per-patch sums stand in for the flattened
    * patch vector (lossless codec ⇒ equality of sums over every patch
    * pins the full pixel mapping).
    */
  def patchifyImages(assets: Dataset[ImageAsset], outW: Int, outH: Int,
      patchW: Int, patchH: Int): Dataset[PatchMeta] = {
    require(outW % patchW == 0 && outH % patchH == 0,
      "patch grid must tile the resized image exactly")
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
      require(img != null, s"asset ${a.asset_id}: payload is not a decodable image")
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      for {
        pr <- 0 until outH / patchH
        pc <- 0 until outW / patchW
      } yield {
        var sum = 0L
        var mn = 255
        var mx = 0
        var oy = pr * patchH
        while (oy < (pr + 1) * patchH) {
          val sy = oy * h / outH
          var ox = pc * patchW
          while (ox < (pc + 1) * patchW) {
            val v = raster.getSample(ox * w / outW, sy, 0)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            ox += 1
          }
          oy += 1
        }
        PatchMeta(a.asset_id, pr, pc, sum, mn, mx)
      }
    }
  }

  /** Perceptual average-hash of an image, split into two 32-bit halves
    * (packing all 64 bits into one signed long would put bit 63 in the
    * sign position — two non-negative halves keep every shift/mask/
    * popcount identical across engines).
    */
  final case class ImageHash(asset_id: Long, ahash_hi: Long, ahash_lo: Long)

  /** PERCEPTUAL image hashing (aHash): decode, nearest-neighbor resample
    * to the canonical 8×8 grid (same integer index arithmetic as
    * [[resizeImages]]), threshold each cell against the grid's integer
    * mean — bit j (row-major) = pixel_j > mean — and pack the 64 bits
    * into (hi, lo) 32-bit halves. Near-identical images (rescaled,
    * re-encoded, lightly edited) land within a few bits of each other,
    * which is what makes image-level near-dedup possible WITHOUT pixel
    * comparison. All-integer (resample indices, sum, `div` mean), so the
    * DuckDB oracle replays every bit from the synthetic-pixel formula
    * without decoding a PNG. One partition-batched map pass, no shuffle.
    */
  def aHashImages(assets: Dataset[ImageAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"asset ${a.asset_id}: payload is not a decodable image")
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        val p = new Array[Int](64)
        var sum = 0L
        var j = 0
        while (j < 64) {
          p(j) = raster.getSample((j % 8) * w / 8, (j / 8) * h / 8, 0)
          sum += p(j)
          j += 1
        }
        val mean = sum / 64
        var hi = 0L
        var lo = 0L
        j = 0
        while (j < 64) {
          if (p(j) > mean) {
            if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
          }
          j += 1
        }
        ImageHash(a.asset_id, hi, lo)
      }
    }
  }

  /** Image near-dup pairs by PIGEONHOLE-banded hamming search over
    * [[aHashImages]] hashes: the 64 bits split into four 16-bit bands;
    * `maxDist ≤ 3` bit flips cannot touch all four bands, so every
    * qualifying pair shares at least one exact band value — the SimHash
    * band trick ([[Dedup.simhashNearDupPairs]]) applied to the image
    * modality. Candidates join on (band, value) — a keyed equi-join,
    * NEVER an all-pairs scan — then verify with two XOR popcounts.
    *
    * Scale: the shuffle carries (band value, id, hash halves) — 4 rows of
    * a few longs per image, never pixels. Flat regions hash to all-0/all-1
    * bands (the hot buckets of this modality); real corpora cap those
    * buckets exactly like the text LSH path's `maxBucketSize` audit.
    */
  def aHashNearDupPairs(hashes: DataFrame, idCol: String, maxDist: Int)
      : DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4 bands of 16 bits pigeonhole-guarantee recall only for maxDist <= 3")
    // both sides of the band join derive from `hashes`; persist it so the
    // upstream hash pass (for the declared queries: PNG synthesis + a real
    // ImageIO decode per asset, the most expensive map work in the
    // modality) runs once, not twice. (id, 2 longs) per asset — tiny.
    val h = hashes.localCheckpoint(true)
    val bands = h.select(col(idCol), col("ahash_hi"), col("ahash_lo"),
      explode(array((0 until 4).map { b =>
        val half = if (b < 2) col("ahash_lo") else col("ahash_hi")
        struct(lit(b).as("b"),
          shiftright(half, (b % 2) * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))
      }: _*)).as("bk"))
    val a = bands.select(col("bk"), col(idCol).as("id_a"),
      col("ahash_hi").as("__ha"), col("ahash_lo").as("__la"))
    val b = bands.select(col("bk"), col(idCol).as("id_b"),
      col("ahash_hi").as("__hb"), col("ahash_lo").as("__lb"))
    a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        (bit_count(col("__ha").bitwiseXOR(col("__hb"))) +
          bit_count(col("__la").bitwiseXOR(col("__lb")))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /** 16-bit energy-profile fingerprint of an audio asset (see
    * [[fingerprintAudio]]).
    */
  final case class AudioFingerprint(asset_id: Long, afp: Long)

  /** PERCEPTUAL audio fingerprinting: decode, split the sample stream
    * into 16 contiguous segments (integer bounds `j·n div 16`), set bit j
    * iff segment j's energy exceeds its share of the total —
    * `segSum·n > total·segLen`, an integer CROSS-MULTIPLY so no division
    * ever rounds — and pack the 16 bits into a long. The audio analogue
    * of [[aHashImages]]: clips with the same coarse loudness contour
    * (re-encoded, trimmed silence, volume-normalized) collide or land
    * within a bit or two. Lossless PCM + integer thresholds ⇒ the oracle
    * replays every bit from the synthetic-sample formula. One
    * partition-batched map pass, no shuffle.
    */
  def fingerprintAudio(assets: Dataset[AudioAsset]): Dataset[AudioFingerprint] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val samples = wavSamples(a.payload)
          .getOrElse(throw new IllegalArgumentException(
            s"asset ${a.asset_id}: payload is not 8-bit unsigned PCM WAV"))
          ._2
        val n = samples.length
        var total = 0L
        var i = 0
        while (i < n) { total += samples(i); i += 1 }
        var afp = 0L
        var j = 0
        while (j < 16) {
          val lo = j * n / 16
          val hi = (j + 1) * n / 16
          var segSum = 0L
          var k = lo
          while (k < hi) { segSum += samples(k); k += 1 }
          if (segSum * n > total * (hi - lo)) afp |= 1L << j
          j += 1
        }
        AudioFingerprint(a.asset_id, afp)
      }
    }
  }

  /** Audio near-dup pairs over [[fingerprintAudio]] fingerprints: four
    * 4-bit pigeonhole bands (hamming ≤ 3 cannot touch all four) → keyed
    * candidate join → XOR-popcount verify — the same banded shape as the
    * image and SimHash paths, tuned to the 16-bit signature. A 16-bit
    * profile is deliberately coarse (collisions ARE the recall), so pair
    * volume is higher than the 64-bit image hash; real deployments widen
    * the signature, and the band arithmetic generalizes unchanged.
    */
  def audioNearDupPairs(fps: DataFrame, idCol: String, maxDist: Int)
      : DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4 bands of 4 bits pigeonhole-guarantee recall only for maxDist <= 3")
    // persist: both join sides derive from `fps`, whose upstream (WAV
    // decode + energy profile per asset) must not run twice —
    // the [[aHashNearDupPairs]] rationale on the audio modality
    val f = fps.localCheckpoint(true)
    val bands = f.select(col(idCol), col("afp"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("b"),
          shiftright(col("afp"), b * 4).bitwiseAND(lit(15L)).as("bh"))
      }: _*)).as("bk"))
    val a = bands.select(col("bk"), col(idCol).as("id_a"), col("afp").as("__fa"))
    val b = bands.select(col("bk"), col(idCol).as("id_b"), col("afp").as("__fb"))
    a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        bit_count(col("__fa").bitwiseXOR(col("__fb"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /** One audio asset (payload IS a real WAV file) and its decoded sample
    * statistics — the typed schema of the dedicated audio path.
    */
  final case class AudioAsset(asset_id: Long, payload: Array[Byte])

  final case class AudioMeta(
      asset_id: Long,
      n_samples: Int,
      sample_rate: Int,
      sample_sum: Long,
      sample_min: Int,
      sample_max: Int)

  /** Deterministic 8-bit unsigned PCM mono WAV: n = 64 + id mod 64
    * samples at 8 kHz, sample(i) = (id·17 + i·29) mod 256. PCM is
    * lossless, so decode recovers these values exactly — the same
    * real-codec-oracle trick as [[syntheticPng]].
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 64 + (id % 64).toInt
    // canonical 44-byte RIFF/WAVE container (16-byte PCM fmt chunk + data
    // chunk), byte-identical to what AudioSystem.write emits for this
    // format — written directly because AudioSystem.write runs a service-
    // provider lookup PER CALL (~ms), which dominated the whole synthesis
    // pass at corpus scale. The payload is still a real WAV: every reader
    // (including this module's javax.sound decode paths) parses it
    // unchanged, so decoded samples, format fields and all downstream
    // statistics are bit-identical.
    val out = new Array[Byte](44 + n)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >>> 8) & 0xFF).toByte
      out(off + 2) = ((v >>> 16) & 0xFF).toByte
      out(off + 3) = ((v >>> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >>> 8) & 0xFF).toByte
    }
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    ascii(0, "RIFF"); le32(4, 36 + n); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, 8000) // sample rate
    le32(28, 8000) // byte rate
    le16(32, 1) // block align
    le16(34, 8) // bits per sample (8-bit PCM is unsigned by convention)
    ascii(36, "data"); le32(40, n)
    var i = 0
    while (i < n) {
      out(44 + i) = ((id * 17 + i * 29) % 256).toByte
      i += 1
    }
    out
  }

  /** The documents table as a corpus of real WAV assets (encoded on
    * executors).
    */
  def wavAssets(spark: SparkSession, sfDir: String): Dataset[AudioAsset] = {
    import spark.implicits._
    // same degenerate-scan fan-out as [[pngAssets]]
    graft.io.Tables.fanOut(
        graft.io.Tables.testTable(spark, sfDir, "documents")
          .select(col("doc_id")), col("doc_id"))
      .as[Long]
      .map(id => AudioAsset(id, syntheticWav(id)))
  }

  /** Dedicated audio-decode path: REAL `javax.sound.sampled` WAV/PCM
    * decode per partition, emitting sample statistics. Strict — this
    * path's inputs are by contract real audio files.
    */
  def decodeAudio(assets: Dataset[AudioAsset]): Dataset[AudioMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (fmt, samples) = wavSamples(a.payload).getOrElse(
          throw new IllegalArgumentException(
            s"asset ${a.asset_id}: payload is not decodable 8-bit PCM WAV"))
        // a valid WAV may carry an empty data chunk — min/max of nothing
        // must not throw
        val (mn, mx) =
          if (samples.isEmpty) (0, 0) else (samples.min, samples.max)
        AudioMeta(a.asset_id, samples.length, fmt.getSampleRate.toInt,
          samples.map(_.toLong).sum, mn, mx)
      }
    }
  }

  /** Frame-sample output: every `stride`-th decoded sample's exact stats
    * (the audio analogue of video frame sampling — a temporal stride over
    * the decoded signal).
    */
  final case class FrameMeta(
      asset_id: Long,
      n_frames: Int,
      frame_sum: Long,
      frame_min: Int,
      frame_max: Int)

  /** REAL audio frame sampling per partition: `javax.sound.sampled`
    * decode, then every `stride`-th sample (indices 0, stride, 2·stride…)
    * — the decimation step that bounds per-asset feature size before
    * embedding. Integer index arithmetic, oracle-replayable; PCM decode
    * is lossless so the sampled values are exact.
    */
  def sampleAudioFrames(assets: Dataset[AudioAsset], stride: Int)
      : Dataset[FrameMeta] = {
    import assets.sparkSession.implicits._
    require(stride >= 1, "stride >= 1")
    assets.mapPartitions { it =>
      it.map { a =>
        val (_, samples) = wavSamples(a.payload).getOrElse(
          throw new IllegalArgumentException(
            s"asset ${a.asset_id}: payload is not decodable 8-bit PCM WAV"))
        var i = 0
        var n = 0
        var sum = 0L
        var mn = 255
        var mx = 0
        while (i < samples.length) {
          val v = samples(i)
          n += 1
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += stride
        }
        if (n == 0) FrameMeta(a.asset_id, 0, 0L, 0, 0)
        else FrameMeta(a.asset_id, n, sum, mn, mx)
      }
    }
  }

  // ------------------------------------------------------------------
  // STORED image-hash state: incremental perceptual near-dup
  // ------------------------------------------------------------------

  /** The banded rows [[aHashNearDupPairs]] joins on, as a storable
    * relation: (id, hash halves, band index, 16-bit band value).
    */
  def imageBandRows(hashes: DataFrame, idCol: String): DataFrame =
    hashes.select(col(idCol).as("asset_id"), col("ahash_hi"),
      col("ahash_lo"),
      explode(array((0 until 4).map { b =>
        val half = if (b < 2) col("ahash_lo") else col("ahash_hi")
        struct(lit(b).as("b"),
          shiftright(half, (b % 2) * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))
      }: _*)).as("bk"))
      .select(col("asset_id"), col("ahash_hi"), col("ahash_lo"),
        col("bk.b").as("b"), col("bk.bh").as("bh"))

  private def imgStateName(name: String) = s"${name}_imgbands"

  /** Seed the image-hash state: the corpus's band rows, BUCKETED on the
    * band value so nightly probes read co-located buckets. The stored
    * relation carries hashes (4 longs/row), never pixels.
    */
  def createImageHashState(spark: SparkSession, warehouseDir: String,
      name: String, hashes: DataFrame, idCol: String,
      numBuckets: Int): Unit =
    graft.io.Tables.writeWarehouseBucketed(imageBandRows(hashes, idCol),
      warehouseDir, imgStateName(name), "bh", numBuckets)

  /** Nightly incremental image near-dup: probe the night's hashes
    * against the STORED band state (equi-join on (b, band value) — the
    * state side reads co-located buckets, only the batch side
    * shuffles), add the batch's internal pairs, then append the batch's
    * band rows. Nightly cost O(batch ⋈ touched buckets), the corpus's
    * pixels and hashes are never rescanned. The append is EXACTLY-ONCE
    * under at-least-once replay without a ledger: an anti-join on
    * already-present asset ids drops a crashed attempt's half-appended
    * rows (id-complete rows are re-derived identically, and pair
    * discovery upstream of the append is pure).
    *
    * Every cross-batch pair is discovered exactly once — when its later
    * member's batch probes — so the UNION of per-batch outputs over any
    * batch split equals [[aHashNearDupPairs]] over the full corpus (the
    * declared query's oracle). Pairs emit id-ordered (least, greatest).
    */
  def appendImageNearDup(spark: SparkSession, warehouseDir: String,
      name: String, batchHashes: DataFrame, idCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4 bands of 16 bits pigeonhole-guarantee recall only for maxDist <= 3")
    val state = graft.io.Tables.readWarehouseBucketed(spark,
      imgStateName(name))
    val batchBands = imageBandRows(batchHashes, idCol)
      .localCheckpoint(true)
    val cross = batchBands
      .select(col("b"), col("bh"), col("asset_id").as("id_a"),
        col("ahash_hi").as("__ha"), col("ahash_lo").as("__la"))
      .join(state.select(col("b"), col("bh"), col("asset_id").as("id_b"),
        col("ahash_hi").as("__hb"), col("ahash_lo").as("__lb")),
        Seq("b", "bh"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("hamming",
        (bit_count(col("__ha").bitwiseXOR(col("__hb"))) +
          bit_count(col("__la").bitwiseXOR(col("__lb")))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("hamming"))
    val internal = aHashNearDupPairs(batchHashes, idCol, maxDist)
    val pairs = cross.unionByName(internal).distinct()
      .localCheckpoint(true)
    val fresh = batchBands.join(
      state.select(col("asset_id")).distinct(), Seq("asset_id"), "left_anti")
    fresh.write.mode("append").insertInto(imgStateName(name))
    pairs
  }

  /** The documents table re-cast as a binary asset corpus — the stand-in
    * media source for tests and declared queries (text bytes as payload).
    */
  def documentAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.io.Tables.fanOut(
        graft.io.Tables.testTable(spark, sfDir, "documents"), col("doc_id"))
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
