package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Multimodal.{Asset, DecodedAsset}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets(rows: (Long, String, String)*) =
    rows.map { case (id, mod, payload) =>
      Asset(id, mod, payload.getBytes("UTF-8"), "test")
    }.toDS()

  test("withBinaryMeta computes length/checksum/magic without decoding") {
    val out = Multimodal.withBinaryMeta(
      assets((1L, "image", "PNGx rest-of-bytes")).toDF(), "payload")
      .select("n_bytes", "checksum", "magic").collect().head
    assert(out.getLong(0) === 18L)
    assert(out.getString(1).length === 32)
    assert(out.getString(2) === "504E4778") // "PNGx" in hex
  }

  test("decodePartitions is deterministic and schema-complete") {
    val ds = assets(
      (1L, "image", "fake-jpeg-bytes"),
      (2L, "audio", "fake-wav-bytes"),
      (3L, "video", "fake-mp4-bytes"))
    val once = Multimodal.decodePartitions(ds).collect().sortBy(_.asset_id)
    val twice = Multimodal.decodePartitions(ds).collect().sortBy(_.asset_id)
    assert(once.map(_.checksum).toSeq === twice.map(_.checksum).toSeq)
    once.foreach { d =>
      assert(d.n_bytes > 0)
      assert(d.width >= 64 && d.height >= 64)
      assert(d.feature.length === 8)
      assert(d.feature.forall(f => f >= 0.0f && f <= 1.0f))
      if (d.modality != "video") assert(d.n_frames === 1)
    }
    assert(once.find(_.modality == "video").get.n_frames >= 1)
  }

  test("decode output matches the md5-arithmetic oracle formula") {
    val ds = assets((7L, "video", "some media payload"))
    val d = Multimodal.decodePartitions(ds).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("some media payload".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def byteAt(i: Int) = Integer.parseInt(md.substring(i, i + 2), 16)
    assert(d.checksum === md)
    assert(d.width === 64 + byteAt(0) * 4)
    assert(d.height === 64 + byteAt(2) * 4)
    assert(d.n_frames === 1 + byteAt(4) % 64)
  }

  test("documentAssets builds a typed binary corpus from documents") {
    val ds = Multimodal.documentAssets(spark, "/root/testdata/sf0.001")
    val rows = ds.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(a => Set("image", "audio", "video")(a.modality)))
    assert(rows.forall(_.payload.nonEmpty))
  }

  test("decodeImages round-trips the synthetic PNG exactly (real codec)") {
    val ids = Seq(0L, 1L, 7L, 8L, 63L, 64L, 12345L)
    val ds = ids.map(id => Multimodal.ImageAsset(id, Multimodal.syntheticPng(id))).toDS()
    val out = Multimodal.decodeImages(ds).collect().map(m => m.asset_id -> m).toMap
    ids.foreach { id =>
      val w = 8 + (id % 8).toInt
      val h = 8 + ((id / 8) % 8).toInt
      val grays = for (y <- 0 until h; x <- 0 until w)
        yield ((id * 31 + x * 7 + y * 13) % 256).toInt
      val m = out(id)
      assert(m.width === w)
      assert(m.height === h)
      assert(m.n_pixels === w * h)
      assert(m.pixel_sum === grays.map(_.toLong).sum, s"id=$id")
      assert(m.pixel_min === grays.min)
      assert(m.pixel_max === grays.max)
    }
  }

  test("decodeAudio round-trips the synthetic WAV exactly (real codec)") {
    val ids = Seq(0L, 1L, 63L, 64L, 127L, 9876L)
    val ds = ids.map(id => Multimodal.AudioAsset(id, Multimodal.syntheticWav(id))).toDS()
    val out = Multimodal.decodeAudio(ds).collect().map(m => m.asset_id -> m).toMap
    ids.foreach { id =>
      val n = 64 + (id % 64).toInt
      val samples = (0 until n).map(i => ((id * 17 + i * 29) % 256).toInt)
      val m = out(id)
      assert(m.n_samples === n)
      assert(m.sample_rate === 8000)
      assert(m.sample_sum === samples.map(_.toLong).sum, s"id=$id")
      assert(m.sample_min === samples.min)
      assert(m.sample_max === samples.max)
    }
  }

  test("decodePartitions really decodes valid audio payloads") {
    val id = 5L
    val wav = Multimodal.syntheticWav(id)
    val d = Multimodal.decodePartitions(
      Seq(Asset(id, "audio", wav, "test")).toDS()).collect().head
    assert(d.width === 8000, "real sample rate, not md5-derived")
    assert(d.height === 1, "mono")
    assert(d.n_frames === 64 + (id % 64).toInt, "real frame count")
    val samples = (0 until d.n_frames).map(i => ((id * 17 + i * 29) % 256).toInt)
    val bins = new Array[Float](8)
    samples.foreach(v => bins(v >> 5) += 1f)
    assert(d.feature.toSeq === bins.toSeq, "amplitude histogram from actual samples")
  }

  test("decodePartitions really decodes valid image payloads (histogram feature)") {
    val id = 42L
    val png = Multimodal.syntheticPng(id)
    val d = Multimodal.decodePartitions(
      Seq(Asset(id, "image", png, "test")).toDS()).collect().head
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id / 8) % 8).toInt
    assert(d.width === w && d.height === h, "real dimensions, not md5-derived")
    val grays = for (y <- 0 until h; x <- 0 until w)
      yield ((id * 31 + x * 7 + y * 13) % 256).toInt
    val bins = new Array[Float](8)
    grays.foreach(g => bins(g >> 5) += 1f)
    assert(d.feature.toSeq === bins.toSeq, "gray histogram from the actual raster")
    // and the same bytes under a non-image modality take the derived path
    val audio = Multimodal.decodePartitions(
      Seq(Asset(id, "audio", png, "test")).toDS()).collect().head
    assert(audio.width >= 64, "non-image modality uses the derived stand-in")
  }

  test("resizeImages nearest-neighbor matches the exact integer resample") {
    val id = 11L
    val assets = Seq(Multimodal.ImageAsset(id, Multimodal.syntheticPng(id))).toDS()
    val got = Multimodal.resizeImages(assets, 4, 4).collect().head
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id / 8) % 8).toInt
    val vals = for (oy <- 0 until 4; ox <- 0 until 4)
      yield ((id * 31 + (ox * w / 4) * 7 + (oy * h / 4) * 13) % 256).toInt
    assert(got.pixel_sum === vals.map(_.toLong).sum)
    assert(got.pixel_min === vals.min && got.pixel_max === vals.max)
  }

  test("patchifyImages tiles the resample exactly: patch sums partition the resized image") {
    val id = 11L
    val assets = Seq(Multimodal.ImageAsset(id, Multimodal.syntheticPng(id))).toDS()
    val patches = Multimodal.patchifyImages(assets, 8, 8, 4, 4).collect()
    assert(patches.length === 4, "8×8 resample in 4×4 patches → 2×2 grid")
    assert(patches.map(p => (p.patch_row, p.patch_col)).toSet ===
      Set((0, 0), (0, 1), (1, 0), (1, 1)))
    // exact per-patch values from the pixel formula + resample arithmetic
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id / 8) % 8).toInt
    def v(ox: Int, oy: Int): Long = (id * 31 + (ox * w / 8) * 7 + (oy * h / 8) * 13) % 256
    patches.foreach { p =>
      val vals = for {
        oy <- p.patch_row * 4 until (p.patch_row + 1) * 4
        ox <- p.patch_col * 4 until (p.patch_col + 1) * 4
      } yield v(ox, oy)
      assert(p.pixel_sum === vals.sum, s"patch (${p.patch_row},${p.patch_col})")
      assert(p.pixel_min === vals.min && p.pixel_max === vals.max)
    }
    // the four patches partition the 8×8 resample: sums must add up to
    // the resizeImages total over the same target shape
    val whole = Multimodal.resizeImages(assets, 8, 8).collect().head
    assert(patches.map(_.pixel_sum).sum === whole.pixel_sum)
  }

  test("sampleAudioFrames decimates by stride, including the short-tail count") {
    val id = 3L // n = 64 + 3 = 67 samples -> ceil(67/8) = 9 frames
    val assets = Seq(Multimodal.AudioAsset(id, Multimodal.syntheticWav(id))).toDS()
    val got = Multimodal.sampleAudioFrames(assets, 8).collect().head
    val vals = (0 until 67 by 8).map(i => ((id * 17 + i * 29) % 256).toInt)
    assert(got.n_frames === 9)
    assert(got.frame_sum === vals.map(_.toLong).sum)
    assert(got.frame_min === vals.min && got.frame_max === vals.max)
  }

  test("audio fingerprint matches the direct segment-energy computation") {
    val id = 19L
    val assets = Seq(Multimodal.AudioAsset(id, Multimodal.syntheticWav(id))).toDS()
    val got = Multimodal.fingerprintAudio(assets).collect().head.afp
    val n = 64 + (id % 64).toInt
    val s = Array.tabulate(n)(i => ((id * 17 + i * 29) % 256).toInt)
    val total = s.map(_.toLong).sum
    val want = (0 until 16).map { j =>
      val (lo, hi) = (j * n / 16, (j + 1) * n / 16)
      val seg = (lo until hi).map(s(_).toLong).sum
      if (seg * n > total * (hi - lo)) 1L << j else 0L
    }.reduce(_ | _)
    assert(got === want)
  }

  test("audioNearDupPairs: identical clips pair at hamming 0, pairs partition-invariant") {
    // ids 256 apart produce identical synthetic WAVs (same n via mod 64,
    // same samples via mod 256)
    val ids = Seq(19L, 275L, 40L)
    val assets = ids.map(id => Multimodal.AudioAsset(id, Multimodal.syntheticWav(id))).toDS()
    val fps = Multimodal.fingerprintAudio(assets).toDF()
    val pairs = Multimodal.audioNearDupPairs(fps, "asset_id", maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((19L, 275L, 0L)))
    val again = Multimodal.audioNearDupPairs(fps.repartition(5), "asset_id", 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === pairs)
  }

  test("aHash matches the direct 8x8 resample-threshold computation") {
    val id = 42L
    val assets = Seq(Multimodal.ImageAsset(id, Multimodal.syntheticPng(id))).toDS()
    val got = Multimodal.aHashImages(assets).collect().head
    val (w, h) = (8 + (id % 8).toInt, 8 + ((id / 8) % 8).toInt)
    val p = (0 until 64).map(j =>
      ((id * 31 + ((j % 8) * w / 8) * 7 + ((j / 8) * h / 8) * 13) % 256).toInt)
    val mean = p.map(_.toLong).sum / 64
    val expLo = (0 until 32).map(j => if (p(j) > mean) 1L << j else 0L).reduce(_ | _)
    val expHi = (32 until 64).map(j => if (p(j) > mean) 1L << (j - 32) else 0L).reduce(_ | _)
    assert((got.ahash_hi, got.ahash_lo) === (expHi, expLo))
  }

  test("aHash near-dup pairs: identical images at hamming 0, distinct ones dropped") {
    // ids 256 apart render pixel-identical synthetic PNGs (31 has
    // multiplicative order dividing 256's cycle; w/h repeat mod 64) —
    // real exact-duplicate images through the real codec
    val ids = Seq(7L, 263L, 12L)
    val assets = ids.map(id => Multimodal.ImageAsset(id, Multimodal.syntheticPng(id))).toDS()
    val hashes = Multimodal.aHashImages(assets).toDF()
    val pairs = Multimodal.aHashNearDupPairs(hashes, "asset_id", maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    val hm = hashes.as[Multimodal.ImageHash].collect()
      .map(x => x.asset_id -> ((x.ahash_hi, x.ahash_lo))).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b && hm(a) == hm(b)
    } yield (a, b, 0L)).toSet
    assert(pairs === expected)
    assert(pairs.contains((7L, 263L, 0L)))
    // partition-invariance of the banded pair search
    val again = Multimodal.aHashNearDupPairs(hashes.repartition(5), "asset_id", 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === pairs)
  }

  test("stored band state: incremental chain finds exactly the full-corpus pairs; append replay inert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-img").toString
    spark.sql("DROP TABLE IF EXISTS imgspec_imgbands")
    try {
      // 263 ≡ 7 and 268 ≡ 12 (mod 256) render pixel-identical PNGs —
      // cross-batch AND within-batch duplicate pairs both present
      val ids = Seq(7L, 12L, 263L, 268L, 40L, 296L)
      def hashesOf(xs: Seq[Long]) = Multimodal.aHashImages(
        xs.map(id => Multimodal.ImageAsset(id, Multimodal.syntheticPng(id))).toDS()).toDF()
      val b0 = Seq(7L, 12L)
      val b1 = Seq(263L, 40L, 296L) // 263~7 cross-batch; 40~296 internal
      val b2 = Seq(268L)            // 268~12 across TWO batches back
      Multimodal.createImageHashState(spark, wh, "imgspec", hashesOf(b0),
        "asset_id", 2)
      val p1 = Multimodal.appendImageNearDup(spark, wh, "imgspec",
        hashesOf(b1), "asset_id", 1).as[(Long, Long, Long)].collect().toSet
      val p2 = Multimodal.appendImageNearDup(spark, wh, "imgspec",
        hashesOf(b2), "asset_id", 1).as[(Long, Long, Long)].collect().toSet
      val internal0 = Multimodal.aHashNearDupPairs(hashesOf(b0), "asset_id", 1)
        .as[(Long, Long, Long)].collect().toSet
      val full = Multimodal.aHashNearDupPairs(hashesOf(ids), "asset_id", 1)
        .as[(Long, Long, Long)].collect().toSet
      assert((internal0 ++ p1 ++ p2) === full)
      assert(p1.contains((7L, 263L, 0L)), "cross-batch pair on arrival")
      assert(p1.contains((40L, 296L, 0L)), "within-batch pair")
      assert(p2.contains((12L, 268L, 0L)), "pair reaching two batches back")

      // replayed append: the id anti-join keeps state rows unique, and
      // re-probing yields the same pairs (minus nothing, plus nothing)
      val replay = Multimodal.appendImageNearDup(spark, wh, "imgspec",
        hashesOf(b2), "asset_id", 1).as[(Long, Long, Long)].collect().toSet
      assert(replay === p2)
      val stateIds = graft.io.Tables.readWarehouseBucketed(spark,
        "imgspec_imgbands").select("asset_id").distinct().count()
      assert(stateIds === ids.size.toLong)
    } finally spark.sql("DROP TABLE IF EXISTS imgspec_imgbands")
  }
}
