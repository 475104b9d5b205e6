package graft
package ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media travel as
  * opaque `binary` columns with typed metadata derived next to them.
  *
  * What is REAL here (and tested): the schema convention, byte-level
  * metadata extraction (magic-byte format sniffing, PNG IHDR dimension
  * parse), deterministic content fingerprints, evenly-spaced frame
  * sampling with binary slicing, and the batch decode plumbing
  * (mapPartitions with case-class Encoders — the Scala analog of
  * arrow-batched decode UDFs).
  *
  * Pixel/sample decode: REAL since round 8 — [[Media]] decodes pixels
  * through the JDK's own codecs (javax.imageio: PNG/GIF/BMP/JPEG) and
  * PCM samples by direct byte arithmetic, all oracle-gated
  * (q114–q116). The [[stubFeatures]] / [[decodeBatchStub]] /
  * [[resizeBatchStub]] members below remain as the deterministic-fake
  * EMBEDDING seam only (a learned image/audio embedding model is
  * genuinely out of environment; its plumbing — mapPartitions, schema,
  * batch shape — is what these pin down and q31 gates).
  *
  * Scale posture: all metadata/fingerprint/frame paths are pure Column
  * expressions — linear, shuffle-free, codegen-resident. Frame
  * sampling multiplies rows by k via posexplode (a Generate, no
  * shuffle); heavy decode runs partition-local.
  */
object Multimodal {

  /** Magic-prefix table (uppercase hex) -> canonical format tag. */
  val magicTable: Seq[(String, String)] = Seq(
    "89504E47" -> "png", "FFD8FF" -> "jpeg", "47494638" -> "gif",
    "52494646" -> "riff", "25504446" -> "pdf", "494433" -> "mp3",
    "664C6143" -> "flac")

  /** Byte length of the blob. */
  def byteCount(bin: Column): Column = length(bin).cast("long")

  /** Format sniff from the leading magic bytes; 'unknown' otherwise. */
  def sniffFormat(bin: Column): Column = {
    val h = hex(substring(bin, 1, 8))
    val first = when(h.startsWith(magicTable.head._1), magicTable.head._2)
    magicTable.tail.foldLeft(first) { case (acc, (m, n)) =>
      acc.when(h.startsWith(m), n)
    }.otherwise("unknown")
  }

  /** Deterministic content fingerprint, portable across engines that
    * lack md5-over-binary: md5 of the uppercase hex encoding.
    */
  def hexFingerprint(bin: Column): Column = md5(hex(bin))

  private def isPng(bin: Column): Column =
    hex(substring(bin, 1, 8)) === lit("89504E470D0A1A0A")

  /** REAL metadata parse: PNG IHDR width (bytes 17-20, big-endian);
    * null for non-PNG blobs.
    */
  def pngWidth(bin: Column): Column =
    when(isPng(bin), conv(hex(substring(bin, 17, 4)), 16, 10).cast("long"))
      .otherwise(lit(null).cast("long"))

  /** REAL metadata parse: PNG IHDR height (bytes 21-24, big-endian). */
  def pngHeight(bin: Column): Column =
    when(isPng(bin), conv(hex(substring(bin, 21, 4)), 16, 10).cast("long"))
      .otherwise(lit(null).cast("long"))

  private def isGif(bin: Column): Column =
    hex(substring(bin, 1, 3)) === lit("474946")

  /** REAL metadata parse: GIF logical-screen width (header bytes 7-8,
    * LITTLE-endian u16 — the byte swap is the parse); null for
    * non-GIF blobs.
    */
  def gifWidth(bin: Column): Column =
    when(isGif(bin),
      conv(concat(hex(substring(bin, 8, 1)), hex(substring(bin, 7, 1))),
        16, 10).cast("long"))
      .otherwise(lit(null).cast("long"))

  /** REAL metadata parse: GIF logical-screen height (bytes 9-10,
    * little-endian u16).
    */
  def gifHeight(bin: Column): Column =
    when(isGif(bin),
      conv(concat(hex(substring(bin, 10, 1)), hex(substring(bin, 9, 1))),
        16, 10).cast("long"))
      .otherwise(lit(null).cast("long"))

  private def isWav(bin: Column): Column =
    hex(substring(bin, 1, 4)) === lit("52494646") &&
      hex(substring(bin, 9, 4)) === lit("57415645")

  /** REAL metadata parse: WAV channel count (fmt chunk bytes 23-24,
    * little-endian u16). Canonical-layout contract: RIFF/WAVE with
    * the fmt chunk first (the layout every standard PCM writer
    * emits); null for non-WAV blobs.
    */
  def wavChannels(bin: Column): Column =
    when(isWav(bin),
      conv(concat(hex(substring(bin, 24, 1)), hex(substring(bin, 23, 1))),
        16, 10).cast("long"))
      .otherwise(lit(null).cast("long"))

  /** REAL metadata parse: WAV sample rate (bytes 25-28, little-endian
    * u32 — four-byte swap).
    */
  def wavSampleRate(bin: Column): Column =
    when(isWav(bin),
      conv(concat(hex(substring(bin, 28, 1)), hex(substring(bin, 27, 1)),
        hex(substring(bin, 26, 1)), hex(substring(bin, 25, 1))),
        16, 10).cast("long"))
      .otherwise(lit(null).cast("long"))

  /** REAL metadata parse: WAV bits per sample (bytes 35-36,
    * little-endian u16).
    */
  def wavBitsPerSample(bin: Column): Column =
    when(isWav(bin),
      conv(concat(hex(substring(bin, 36, 1)), hex(substring(bin, 35, 1))),
        16, 10).cast("long"))
      .otherwise(lit(null).cast("long"))

  // ------------------------------------------------ JPEG SOF walk
  /** SOF marker set: C0-CF minus C4 (DHT), C8 (JPG ext), CC (DAC). */
  private val sofMarkers = Seq(
    "C0", "C1", "C2", "C3", "C5", "C6", "C7",
    "C9", "CA", "CB", "CD", "CE", "CF")

  /** Hex chars of byte `bytePos` (1-based) in hex string `hx`. */
  private def byteHex(hx: Column, bytePos: Column): Column =
    hx.substr((bytePos * 2 - 1).cast("int"), lit(2))

  /** Big-endian u16 at byte `bytePos` (1-based) of hex string `hx`. */
  private def u16be(hx: Column, bytePos: Column): Column =
    conv(hx.substr((bytePos * 2 - 1).cast("int"), lit(4)), 16, 10)
      .cast("long")

  /** REAL metadata parse: JPEG dimensions from the SOF frame header.
    *
    * Unlike PNG/GIF/WAV, JPEG dimensions are NOT at a fixed offset:
    * the file is a sequence of variable-length segments
    * (`FF <marker> <u16 len> <payload>`), and width/height live in the
    * first start-of-frame segment (SOF0..SOF15 minus DHT/JPG/DAC),
    * whose position depends on every APPn/DQT/COM segment before it.
    * This walks the segment chain as a pure Column expression: an
    * `aggregate` fold over `maxSegments` steps carrying a
    * (pos, width, height) struct — each step either finds SOF (records
    * `height` at byte pos+5, `width` at pos+7, both big-endian u16),
    * hops `2 + segLen` bytes forward, or stops (null pos) on
    * truncated/invalid input. Bounded scan: only the first `scanBytes`
    * bytes are hexed, so cost per row is O(scanBytes + maxSegments),
    * shuffle-free and codegen-resident like the other header parses.
    *
    * Returns struct(jpeg_width, jpeg_height); both null for non-JPEG
    * blobs or JPEGs whose SOF lies beyond the scan window.
    */
  /** Default JPEG scan window. Real-world JPEGs carry large pre-SOF
    * metadata — an APP1/EXIF block with an embedded thumbnail
    * routinely exceeds 2 KB, and a single APPn segment can reach the
    * u16 length cap (65535 bytes) — so the default window is 64 KB:
    * any JPEG whose SOF follows at most `maxSegments` segments of any
    * legal size parses. Cost is bounded by the ACTUAL blob length
    * (substring caps at the data), so small blobs pay nothing; only
    * genuinely metadata-heavy rows hex up to 64 KB. The q81 oracle
    * windows its hex to the same constant, so engine/oracle parity is
    * structural, not fixture-dependent (ADVICE r5).
    */
  val defaultJpegScanBytes: Int = 65536

  def jpegDims(bin: Column, maxSegments: Int = 16,
               scanBytes: Int = defaultJpegScanBytes): Column = {
    require(maxSegments >= 1 && scanBytes >= 16,
      s"need maxSegments>=1, scanBytes>=16; got $maxSegments/$scanBytes")
    val hx = hex(substring(bin, 1, scanBytes))
    val nullL = lit(null).cast("long")
    val stopped = struct(nullL.as("pos"), nullL.as("w"), nullL.as("h"))
    val init = struct(lit(3L).as("pos"), nullL.as("w"), nullL.as("h"))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegments)),
      init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val hxLen = length(hx).cast("long")
        // marker bytes pos..pos+1 fully inside the scan window
        val canMarker = (pos + 1) * 2 <= hxLen
        val isFf = byteHex(hx, pos) === lit("FF")
        val marker = byteHex(hx, pos + 1)
        val isSof = marker.isin(sofMarkers: _*)
        // SOF payload: len(2) precision(1) height(2) width(2)
        val canSof = (pos + 8) * 2 <= hxLen
        val canLen = (pos + 3) * 2 <= hxLen
        val segLen = u16be(hx, pos + 2)
        when(pos.isNull, acc) // already stopped or found
          .when(!canMarker || !isFf, stopped)
          .when(isSof && canSof,
            struct(nullL.as("pos"),
              u16be(hx, pos + 7).as("w"), u16be(hx, pos + 5).as("h")))
          .when(!isSof && canLen && segLen >= 2,
            struct((pos + 2 + segLen).as("pos"),
              nullL.as("w"), nullL.as("h")))
          .otherwise(stopped)
      })
    val isJpeg = hx.startsWith("FFD8FF")
    struct(
      when(isJpeg, walked.getField("w")).otherwise(nullL).as("jpeg_width"),
      when(isJpeg, walked.getField("h")).otherwise(nullL).as("jpeg_height"))
  }

  /** STUB feature extractor: `dims` doubles in [0,1] from 4-nibble
    * windows of the content fingerprint — a deterministic fake standing
    * in for a real image/audio embedding model (see class doc). dims <= 8
    * (one md5 yields 8 windows).
    */
  def stubFeatures(bin: Column, dims: Int): Column = {
    require(dims >= 1 && dims <= 8, s"dims must be 1..8, got $dims")
    array((0 until dims).map { d =>
      conv(substring(hexFingerprint(bin), d * 4 + 1, 4), 16, 10)
        .cast("long").cast("double") / lit(65535.0)
    }: _*)
  }

  /** k evenly-spaced frame offsets (0-based) over a blob of nBytes,
    * each frame `frameLen` bytes: offset_i = floor(i*(nBytes-frameLen)
    * / (k-1)). Callers must ensure nBytes >= frameLen.
    */
  def frameOffsets(nBytes: Column, frameLen: Int, k: Int): Column = {
    require(k >= 2, s"k must be >= 2, got $k")
    transform(sequence(lit(0), lit(k - 1)),
      i => (i.cast("long") * (nBytes - lit(frameLen.toLong)) /
        lit((k - 1).toLong)).cast("long"))
  }

  /** Evenly-spaced frame sampling: one output row per (doc, frame) with
    * the frame's offset and content fingerprint. The row-multiplying
    * posexplode is a Generate (no shuffle); frames are byte slices of
    * the blob — for video this is the "sample k keyframe-sized chunks"
    * shape, for audio "k windows".
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameLen: Int, k: Int): DataFrame =
    df.select(col(idCol), col(binCol).as("bin"),
      frameOffsets(byteCount(col(binCol)), frameLen, k).as("offs"))
      .select(col(idCol), col("bin"), posexplode(col("offs")))
      .select(col(idCol),
        col("pos").cast("long").as("frame_idx"),
        col("col").as("frame_offset"),
        hexFingerprint(col("bin").substr(
          (col("col") + 1).cast("int"), lit(frameLen))).as("frame_fp"))

  // ------------------------------------------------- batch decode stub
  case class MediaRow(id: Long, bytes: Array[Byte])
  case class DecodedRow(id: Long, n_bytes: Long, format: String,
                        features: Array[Double])

  /** Batch decode plumbing (the mapPartitions path a real codec plugs
    * into — partition-local, no shuffle, arrow-batch-shaped). The
    * decode body is the same deterministic fake as [[stubFeatures]].
    */
  def decodeBatchStub(ds: Dataset[MediaRow], dims: Int)
                     (implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val hexStr = m.bytes.map("%02X".format(_)).mkString
        val fmt = magicTable.collectFirst {
          case (magic, name) if hexStr.startsWith(magic) => name
        }.getOrElse("unknown")
        md.reset()
        val fp = md.digest(hexStr.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val feats = Array.tabulate(dims) { d =>
          java.lang.Long.parseLong(fp.substring(d * 4, d * 4 + 4), 16) / 65535.0
        }
        DecodedRow(m.id, m.bytes.length.toLong, fmt, feats)
      }
    }
  }

  case class ResizedRow(id: Long, width: Long, height: Long,
                        bytes: Array[Byte])

  /** Batch resize plumbing — STUB body, real shape: partition-local
    * mapPartitions (no shuffle; a real image library slots into the
    * row function), output schema carrying the target dimensions next
    * to the new blob. The fake "resized" blob is deterministic — the
    * content fingerprint repeated to ceil(w*h/256) bytes — so tests
    * can assert size scaling and stability without codecs.
    */
  def resizeBatchStub(ds: Dataset[MediaRow], width: Int, height: Int)
                     (implicit spark: SparkSession): Dataset[ResizedRow] = {
    require(width >= 1 && height >= 1,
      s"target dims must be positive, got ${width}x$height")
    import spark.implicits._
    val outLen = math.max(1, (width.toLong * height / 256L).toInt)
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val fp = md.digest(m.bytes)
        val out = Array.tabulate(outLen)(i => fp(i % fp.length))
        ResizedRow(m.id, width.toLong, height.toLong, out)
      }
    }
  }
}
