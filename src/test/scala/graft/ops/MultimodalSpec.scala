package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 320x240 PNG head: magic + IHDR length/type + width + height
  private val png = hexBytes(
    "89504E470D0A1A0A0000000D4948445200000140000000F0")
  private val jpeg = hexBytes("FFD8FFE000104A464946")

  test("sniffFormat reads magic bytes; unknown for plain text") {
    val d = Seq((1L, png), (2L, jpeg), (3L, "plain text".getBytes("UTF-8")))
      .toDF("id", "bin")
    val got = d.orderBy("id").select(Multimodal.sniffFormat($"bin"))
      .as[String].collect().toSeq
    assert(got === Seq("png", "jpeg", "unknown"))
  }

  test("pngWidth/pngHeight parse real IHDR dimensions; null for non-PNG") {
    val d = Seq((1L, png), (2L, jpeg)).toDF("id", "bin").orderBy("id")
    val rows = d.select(Multimodal.pngWidth($"bin"),
      Multimodal.pngHeight($"bin")).collect()
    assert(rows(0).getLong(0) === 320L)
    assert(rows(0).getLong(1) === 240L)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("gifWidth/gifHeight parse the little-endian screen descriptor; null otherwise") {
    // GIF89a, logical screen 322x240: 0x0142 -> LE bytes 42 01,
    // 0x00F0 -> F0 00. The byte swap IS the parse under test.
    val gif = hexBytes("474946383961" + "4201" + "F000" + "F70000")
    val d = Seq((1L, gif), (2L, png)).toDF("id", "bin").orderBy("id")
    val rows = d.select(Multimodal.gifWidth($"bin"),
      Multimodal.gifHeight($"bin")).collect()
    assert(rows(0).getLong(0) === 322L)
    assert(rows(0).getLong(1) === 240L)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("wavChannels/SampleRate/Bits parse the LE fmt chunk; null otherwise") {
    // canonical 44.1 kHz stereo 16-bit PCM header
    val wav = hexBytes("52494646" + "24080000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0200" + "44AC0000" +
      "10B10200" + "0400" + "1000")
    val d = Seq((1L, wav), (2L, png)).toDF("id", "bin").orderBy("id")
    val rows = d.select(Multimodal.wavChannels($"bin"),
      Multimodal.wavSampleRate($"bin"),
      Multimodal.wavBitsPerSample($"bin")).collect()
    assert(rows(0).getLong(0) === 2L)
    assert(rows(0).getLong(1) === 44100L)
    assert(rows(0).getLong(2) === 16L)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("jpegDims walks SOF segments: baseline, progressive, truncated, non-JPEG") {
    // baseline JFIF: SOI + APP0(16) + SOF0 640x480
    val base = hexBytes("FFD8" +
      "FFE00010" + "4A46494600" + "0101" + "00" + "0048" + "0048" + "0000" +
      "FFC00011" + "08" + "01E0" + "0280" + "03" + "012200" + "021101" + "031101")
    // progressive: SOI + APP0 + DQT(5) + SOF2 100x50 — the walker must
    // hop the extra segment, not assume a fixed SOF offset
    val prog = hexBytes("FFD8" +
      "FFE00010" + "4A46494600" + "0101" + "00" + "0048" + "0048" + "0000" +
      "FFDB0005" + "001122" +
      "FFC2000B" + "08" + "0032" + "0064" + "01" + "011100")
    val d = Seq((1L, base), (2L, prog), (3L, jpeg), (4L, png))
      .toDF("id", "bin").orderBy("id")
    val rows = d.select(Multimodal.jpegDims($"bin").as("j"))
      .select($"j.jpeg_width", $"j.jpeg_height").collect()
    assert(rows(0).getLong(0) === 640L && rows(0).getLong(1) === 480L)
    assert(rows(1).getLong(0) === 100L && rows(1).getLong(1) === 50L)
    // truncated header: walk runs off the blob -> null dims, no error
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    // non-JPEG magic -> null dims
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1))
  }

  test("jpegDims: a >2KB APP1 (large EXIF) fits the default window, misses a 2KB one") {
    // SOI + one 2102-byte APP1 (EXIF-with-thumbnail shape) + SOF0
    // 400x320 — SOF starts at byte 2107, beyond the old 2048 default
    val bigExif = hexBytes("FFD8" + "FFE10836" + ("00" * 2100) +
      "FFC00011" + "08" + "0140" + "0190" + "03" + "012200" + "021101" +
      "031101")
    val d = Seq((1L, bigExif)).toDF("id", "bin")
    // default window (64 KB): parsed
    val ok = d.select(Multimodal.jpegDims($"bin").as("j"))
      .select($"j.jpeg_width", $"j.jpeg_height").head()
    assert(ok.getLong(0) === 400L && ok.getLong(1) === 320L)
    // a 2 KB window stops at the window edge: null dims, no error —
    // the documented miss mode when the window is undersized
    val miss = d.select(
        Multimodal.jpegDims($"bin", scanBytes = 2048).as("j"))
      .select($"j.jpeg_width", $"j.jpeg_height").head()
    assert(miss.isNullAt(0) && miss.isNullAt(1))
  }

  test("jpegDims: DHT (C4) is not a SOF marker and is hopped, not parsed") {
    // SOI + DHT(len 5) + SOF0 8x4: C4 sits inside the C0-CF block but is
    // a Huffman table; reading dims from it would yield garbage.
    val d0 = hexBytes("FFD8" + "FFC40005" + "AABBCC" +
      "FFC0000B" + "08" + "0004" + "0008" + "01" + "011100")
    val rows = Seq((1L, d0)).toDF("id", "bin")
      .select(Multimodal.jpegDims($"bin").as("j"))
      .select($"j.jpeg_width", $"j.jpeg_height").collect()
    assert(rows(0).getLong(0) === 8L && rows(0).getLong(1) === 4L)
  }

  test("jpegDims never throws on adversarial bytes (fuzz property)") {
    // random blobs, random truncations of a valid JPEG, and blobs that
    // start FFD8FF but continue with garbage: the walker must return
    // (possibly null) dims without error — a malformed segment chain
    // is data, not an exception, at corpus scale
    val rnd = new scala.util.Random(99)
    val valid = hexBytes("FFD8" +
      "FFE00010" + "4A46494600" + "0101" + "00" + "0048" + "0048" + "0000" +
      "FFC00011" + "08" + "01E0" + "0280" + "03" + "012200" + "021101" + "031101")
    val fuzz: Seq[(Long, Array[Byte])] =
      (0 until 40).map { i =>
        (i.toLong, Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte))
      } ++
      (0 until valid.length).map { n =>
        (100L + n, valid.take(n))
      } ++
      (0 until 20).map { i =>
        (200L + i, hexBytes("FFD8FF") ++
          Array.fill(rnd.nextInt(48))(rnd.nextInt(256).toByte))
      }
    val rows = fuzz.toDF("id", "bin")
      .select(Multimodal.jpegDims($"bin").as("j"))
      .select($"j.jpeg_width", $"j.jpeg_height").collect()
    assert(rows.length === fuzz.length) // no row errored
    // full valid header still parses inside the fuzz batch
    val full = Seq((1L, valid)).toDF("id", "bin")
      .select(Multimodal.jpegDims($"bin").as("j"))
      .select($"j.jpeg_width").head()
    assert(full.getLong(0) === 640L)
  }

  test("stubFeatures: deterministic, dims-long, in [0,1]") {
    val d = Seq((1L, png)).toDF("id", "bin")
    val f1 = d.select(Multimodal.stubFeatures($"bin", 8)).as[Seq[Double]].head()
    val f2 = d.select(Multimodal.stubFeatures($"bin", 8)).as[Seq[Double]].head()
    assert(f1 === f2)
    assert(f1.length === 8)
    assert(f1.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("sampleFrames: k rows per doc, evenly spaced, stable fingerprints") {
    val blob = Array.tabulate(100)(_.toByte)
    val d = Seq((7L, blob)).toDF("doc_id", "bin")
    val rows = Multimodal.sampleFrames(d, "doc_id", "bin", frameLen = 16, k = 4)
      .orderBy("frame_idx").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("frame_offset")).toSeq === Seq(0L, 28L, 56L, 84L))
    assert(rows.map(_.getAs[String]("frame_fp")).distinct.length === 4)
  }

  test("decodeBatchStub: mapPartitions batch path agrees with the Column path") {
    implicit val s = spark
    val ds = Seq(Multimodal.MediaRow(1L, png),
      Multimodal.MediaRow(2L, "hello world".getBytes("UTF-8"))).toDS()
    val dec = Multimodal.decodeBatchStub(ds, dims = 4).collect()
      .sortBy(_.id)
    assert(dec(0).format === "png")
    assert(dec(0).n_bytes === png.length.toLong)
    assert(dec(1).format === "unknown")
    // column-expression path produces identical features
    val colFeats = Seq((1L, png)).toDF("id", "bin")
      .select(Multimodal.stubFeatures($"bin", 4)).as[Seq[Double]].head()
    assert(dec(0).features.toSeq === colFeats)
  }

  test("resizeBatchStub: deterministic blob, size scales with target dims") {
    implicit val s = spark
    val ds = Seq(Multimodal.MediaRow(1L, png),
      Multimodal.MediaRow(2L, "hello world".getBytes("UTF-8"))).toDS()
    val small = Multimodal.resizeBatchStub(ds, 32, 32).collect().sortBy(_.id)
    val large = Multimodal.resizeBatchStub(ds, 64, 64).collect().sortBy(_.id)
    assert(small.forall(r => r.width === 32L && r.height === 32L))
    assert(small(0).bytes.length === 32 * 32 / 256)
    assert(large(0).bytes.length === 64 * 64 / 256)
    // deterministic: same input + dims -> identical bytes across runs
    val again = Multimodal.resizeBatchStub(ds, 32, 32).collect().sortBy(_.id)
    assert(small(0).bytes.toSeq === again(0).bytes.toSeq)
    // different source content -> different fake payload
    assert(small(0).bytes.toSeq !== small(1).bytes.toSeq)
  }
}
