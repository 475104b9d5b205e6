package graft
package ops

import java.io.ByteArrayInputStream
import java.util.zip.{Adler32, CRC32}

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL pixel/sample decode over binary media columns — the tier that
  * replaces [[Multimodal]]'s documented decode stubs (rounds 1–7 kept
  * the seam honest because "the image/audio libs aren't in this
  * container"; the JDK itself ships them: `javax.imageio` carries
  * standard PNG/GIF/BMP/JPEG codecs and `java.util.zip` the inflate
  * path, both headless-safe — no external dependency involved).
  *
  * What is REAL here (all of it):
  *   - [[decodeImages]]: full pixel decode via ImageIO (PNG/GIF/BMP/
  *     JPEG), integer feature extraction (per-channel sums, luma sum,
  *     8-bin luma histogram) — exact int64 arithmetic so results are
  *     engine-portable and oracle-replayable;
  *   - [[downsampleBox]]: factor-f box-filter thumbnail (the mean of
  *     each f×f block, floor), re-encoded losslessly by [[encodePngStored]];
  *   - [[decodeGifFrames]]: per-frame decode of (animated) GIFs via the
  *     ImageIO reader index — the video-frame-sampling seam with a real
  *     decoder behind it;
  *   - [[decodeWavPcm16]]: PCM sample decode (16-bit LE, the canonical
  *     WAV layout [[Multimodal.wavChannels]] already parses) — peak /
  *     energy stats as exact int64;
  *   - [[encodePngStored]]: a self-contained PNG WRITER (stored-mode
  *     deflate, filter 0) — fixture generator and lossless sink. Its
  *     output is bit-deterministic and its pixel bytes sit at fixed
  *     offsets, so a DuckDB oracle can re-derive the decoded features
  *     from the blob hex by pure substring arithmetic while the engine
  *     decodes through ImageIO — two independent implementations
  *     checking each other.
  *
  * Determinism contract: PNG/GIF/BMP decode is lossless and bit-exact
  * across conforming decoders, so those features are oracle-checkable.
  * JPEG decode is deterministic for a given JRE but IDCT rounding is
  * decoder-specific, so JPEG pixel features are ScalaTest-gated (exact
  * dims, tolerance on means) and never oracle-hashed.
  *
  * Scale posture: every decode runs partition-local inside ONE
  * `mapPartitions` (no shuffle, no driver involvement); features are
  * fixed-width integers so the decoded frame is columnar-friendly; the
  * row-multiplying GIF frame path is bounded by `maxFrames`. At 100 TB
  * the media corpus streams through executors once; nothing here holds
  * more than one image per thread in memory.
  */
object Media {

  locally { System.setProperty("java.awt.headless", "true") }

  /** Integer luma: (299·r + 587·g + 114·b) / 1000, floor — the classic
    * BT.601 weights over a denominator an oracle replays exactly.
    */
  def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Luma histogram bin width: 8 bins over 0..255. */
  val histBins = 8
  private val binWidth = 256 / histBins

  // ------------------------------------------------------- PNG writer

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val len = data.length
    out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte))
    val tb = tag.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    val c = crc.getValue
    out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte))
    out.toByteArray
  }

  /** Raw scanline bytes of an RGB8 image: per row one filter byte (0)
    * then width × 3 samples — the exact layout a stored-mode IDAT
    * carries, which is what makes the fixture oracle-replayable.
    */
  def rawScanlines(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"need w*h*3 = ${width * height * 3} samples, got ${rgb.length}")
    val out = Array.ofDim[Byte](height * (1 + 3 * width))
    var y = 0
    while (y < height) {
      val base = y * (1 + 3 * width)
      out(base) = 0
      System.arraycopy(rgb, y * 3 * width, out, base + 1, 3 * width)
      y += 1
    }
    out
  }

  /** zlib stream with STORED (uncompressed) deflate blocks: header
    * 0x78 0x01, blocks of ≤ 65535 raw bytes (`01`/`00` final flag +
    * LE16 len + LE16 ~len + payload), trailing big-endian Adler-32.
    */
  def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x78); out.write(0x01)
    var off = 0
    while (off < raw.length || (raw.length == 0 && off == 0)) {
      val n = math.min(65535, raw.length - off)
      val fin = off + n >= raw.length
      out.write(if (fin) 1 else 0)
      out.write(n & 0xFF); out.write((n >>> 8) & 0xFF)
      val nlen = n ^ 0xFFFF
      out.write(nlen & 0xFF); out.write((nlen >>> 8) & 0xFF)
      out.write(raw, off, n)
      off += n
      if (fin) off = raw.length + 1
    }
    val ad = new Adler32(); ad.update(raw)
    val a = ad.getValue
    out.write(Array[Byte]((a >>> 24).toByte, (a >>> 16).toByte,
      (a >>> 8).toByte, a.toByte))
    out.toByteArray
  }

  /** A complete, standard PNG (8-bit RGB, filter 0, stored-mode
    * deflate) from raw row-major RGB samples. Any conforming reader —
    * ImageIO included — decodes it; MediaSpec round-trips it. For
    * images under 21845 pixels wide × small heights the single stored
    * block places pixel (x, y)'s R sample at byte offset
    * 48 + y·(1+3·width) + 1 + 3·x (0-based) — the constant the DuckDB
    * oracles build their replay arithmetic on.
    */
  def encodePngStored(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val ihdr = {
      val d = Array.ofDim[Byte](13)
      d(0) = (width >>> 24).toByte; d(1) = (width >>> 16).toByte
      d(2) = (width >>> 8).toByte; d(3) = width.toByte
      d(4) = (height >>> 24).toByte; d(5) = (height >>> 16).toByte
      d(6) = (height >>> 8).toByte; d(7) = height.toByte
      d(8) = 8; d(9) = 2; d(10) = 0; d(11) = 0; d(12) = 0
      d
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(sig)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zlibStored(rawScanlines(width, height, rgb))))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Deterministic fixture: pixel (x, y) = `f(x, y)` (r, g, b each
    * 0..255), encoded by [[encodePngStored]].
    */
  def pngFixture(width: Int, height: Int)
                (f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rgb = Array.ofDim[Byte](width * height * 3)
    var i = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = f(x, y)
        rgb(i) = r.toByte; rgb(i + 1) = g.toByte; rgb(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    encodePngStored(width, height, rgb)
  }

  /** Size of [[encodePngStored]]'s output from the dims alone —
    * sig 8 + IHDR 25 + IDAT (12 + 2 + 5·nblocks + raw + 4) + IEND 12
    * with raw = h·(1+3w) — so an oracle can predict re-encoded byte
    * counts arithmetically.
    */
  def pngStoredSize(width: Int, height: Int): Long = {
    val raw = height.toLong * (1L + 3L * width)
    val nblocks = math.max(1L, (raw + 65534L) / 65535L)
    8L + 25L + (12L + 2L + 5L * nblocks + raw + 4L) + 12L
  }

  // ---------------------------------------------------- image decode

  case class MediaBlob(id: Long, bytes: Array[Byte])

  case class ImageDecodeRow(id: Long, ok: Boolean, n_bytes: Long,
                            width: Option[Long], height: Option[Long],
                            px_count: Option[Long],
                            r_sum: Option[Long], g_sum: Option[Long],
                            b_sum: Option[Long], lum_sum: Option[Long],
                            lum_hist: Option[Seq[Long]])

  private def featuresOf(id: Long, nBytes: Long, w: Int, h: Int,
                         argb: Array[Int]): ImageDecodeRow = {
    var rs = 0L; var gs = 0L; var bs = 0L; var ls = 0L
    val hist = Array.ofDim[Long](histBins)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      val r = (p >>> 16) & 0xFF; val g = (p >>> 8) & 0xFF; val b = p & 0xFF
      rs += r; gs += g; bs += b
      val l = luma(r, g, b)
      ls += l
      hist(l / binWidth) += 1
      i += 1
    }
    ImageDecodeRow(id, ok = true, nBytes, Some(w.toLong), Some(h.toLong),
      Some(w.toLong * h), Some(rs), Some(gs), Some(bs), Some(ls),
      Some(hist.toSeq))
  }

  private def failRow(id: Long, nBytes: Long): ImageDecodeRow =
    ImageDecodeRow(id, ok = false, nBytes, None, None, None, None, None,
      None, None, None)

  /** Decode-bomb guard: a corrupt or hostile blob must not OOM an
    * executor, so dimensions are read from the codec header FIRST and
    * anything above this pixel count fails closed (ok = false) without
    * allocating the raster. 64 MP ≈ a 256 MB ARGB raster — far above
    * any legitimate training-corpus image, far below executor memory.
    */
  val maxDecodePixels: Long = 64L * 1024 * 1024

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) { in.close(); return null }
      val reader = readers.next()
      try {
        reader.setInput(in, true, true)
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > maxDecodePixels) null
        else reader.read(0)
      } finally { reader.dispose(); in.close() }
    } catch { case _: Exception => null }
  }

  private def decodeOne(id: Long, bytes: Array[Byte]): ImageDecodeRow = {
    val nBytes = if (bytes == null) 0L else bytes.length.toLong
    val img = readImage(bytes)
    if (img == null) failRow(id, nBytes)
    else {
      val w = img.getWidth; val h = img.getHeight
      featuresOf(id, nBytes, w, h, img.getRGB(0, 0, w, h, null, 0, w))
    }
  }

  /** REAL batch image decode: (id, ok, n_bytes, width, height,
    * px_count, r_sum, g_sum, b_sum, lum_sum, lum_hist[8]) per blob;
    * undecodable blobs (no registered codec, truncated, null) keep
    * ok = false with null features. Alpha is dropped (features are
    * over the decoded RGB channels, no compositing). One partition-
    * local pass, no shuffle.
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.map(b => decodeOne(b.id, b.bytes)))
      .toDF()
  }

  // --------------------------------------------- perceptual hash (dHash)

  case class ImageDHashRow(id: Long, ok: Boolean, n_bytes: Long,
                           width: Option[Long], height: Option[Long],
                           dhash: Option[String])

  /** Difference hash of one decoded raster: fixed (gw × gh) luma grid
    * by exact integer box-assignment (pixel x lands in cell
    * x·gw DIV w — every cell non-empty when w ≥ gw; cell value =
    * Σluma DIV count), then one bit per horizontally adjacent cell
    * pair: bit(y·(gw−1)+x) = 1 iff grid[y][x+1] &gt; grid[y][x].
    * All-integer, so an engine decoding the same pixels replays the
    * hash bit-for-bit — and a UNIFORM brightness shift +d (no
    * clamping) moves every luma by exactly d (the 299+587+114=1000
    * weights divide out) and every cell mean by exactly d, leaving
    * the hash IDENTICAL: the perceptual invariance is arithmetic
    * here, not approximate.
    */
  private def dhashOf(img: java.awt.image.BufferedImage,
                      gw: Int, gh: Int): String = {
    val w = img.getWidth; val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val sums = Array.ofDim[Long](gh, gw)
    val cnts = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < h) {
      val cy = y * gh / h
      var x = 0
      while (x < w) {
        val p = argb(y * w + x)
        sums(cy)(x * gw / w) +=
          luma((p >>> 16) & 0xFF, (p >>> 8) & 0xFF, p & 0xFF)
        cnts(cy)(x * gw / w) += 1
        x += 1
      }
      y += 1
    }
    val out = new java.lang.StringBuilder((gw - 1) * gh)
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw - 1) {
        val a = sums(cy)(cx) / cnts(cy)(cx)
        val b = sums(cy)(cx + 1) / cnts(cy)(cx + 1)
        out.append(if (b > a) '1' else '0')
        cx += 1
      }
      cy += 1
    }
    out.toString
  }

  /** REAL perceptual-hash pass: (id, ok, n_bytes, width, height,
    * dhash) per blob, dhash = the (gw−1)·gh-char '0'/'1' difference
    * hash over the decoded luma grid (default 9×8 → 64 bits — the
    * drop-in fingerprint for [[Dedup.hammingPairs]]). Fails closed
    * like [[decodeImages]]: undecodable blobs AND images smaller
    * than the grid (a cell would be empty) keep ok = false with a
    * null hash. One partition-local pass, no shuffle — at 100 TB
    * this is the map-only stage before the banded pair join.
    */
  def dhashImages(df: DataFrame, idCol: String, binCol: String,
                  gridW: Int = 9, gridH: Int = 8): DataFrame = {
    require(gridW >= 2 && gridH >= 1,
      s"grid must be at least 2x1, got ${gridW}x$gridH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.map { b =>
        val nBytes = if (b.bytes == null) 0L else b.bytes.length.toLong
        val img = readImage(b.bytes)
        if (img == null || img.getWidth < gridW || img.getHeight < gridH)
          ImageDHashRow(b.id, ok = false, nBytes, None, None, None)
        else ImageDHashRow(b.id, ok = true, nBytes,
          Some(img.getWidth.toLong), Some(img.getHeight.toLong),
          Some(dhashOf(img, gridW, gridH)))
      })
      .toDF()
  }

  // ---------------------------------------------------- box downsample

  case class ResizedImageRow(id: Long, ok: Boolean,
                             width: Option[Long], height: Option[Long],
                             n_bytes: Option[Long],
                             r_sum: Option[Long], g_sum: Option[Long],
                             b_sum: Option[Long], lum_sum: Option[Long],
                             bytes: Option[Array[Byte]])

  /** Factor-f box-filter downsample: output pixel (X, Y) is the
    * per-channel FLOOR MEAN of the f×f input block at
    * (f·X..f·X+f−1, f·Y..f·Y+f−1); trailing rows/columns that don't
    * fill a block are dropped (floor dims). All-integer arithmetic —
    * the oracle replays it with a GROUP BY x/f, y/f — and the result
    * is re-encoded losslessly with [[encodePngStored]], so
    * decode(downsample(decode(png))) is exact. Undecodable inputs and
    * images smaller than one block keep ok = false.
    */
  def downsampleBox(df: DataFrame, idCol: String, binCol: String,
                    factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.map { blob =>
        val img = readImage(blob.bytes)
        if (img == null || img.getWidth < factor || img.getHeight < factor)
          ResizedImageRow(blob.id, ok = false, None, None, None, None,
            None, None, None, None)
        else {
          val w = img.getWidth / factor; val h = img.getHeight / factor
          val argb = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0,
            img.getWidth)
          val stride = img.getWidth
          val rgb = Array.ofDim[Byte](w * h * 3)
          var rs = 0L; var gs = 0L; var bs = 0L; var ls = 0L
          var yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < w) {
              var r = 0L; var g = 0L; var b = 0L
              var dy = 0
              while (dy < factor) {
                var dx = 0
                val rowBase = (yy * factor + dy) * stride + xx * factor
                while (dx < factor) {
                  val p = argb(rowBase + dx)
                  r += (p >>> 16) & 0xFF; g += (p >>> 8) & 0xFF; b += p & 0xFF
                  dx += 1
                }
                dy += 1
              }
              val n = factor.toLong * factor
              val rm = (r / n).toInt; val gm = (g / n).toInt
              val bm = (b / n).toInt
              val o = (yy * w + xx) * 3
              rgb(o) = rm.toByte; rgb(o + 1) = gm.toByte; rgb(o + 2) = bm.toByte
              rs += rm; gs += gm; bs += bm; ls += luma(rm, gm, bm)
              xx += 1
            }
            yy += 1
          }
          val png = encodePngStored(w, h, rgb)
          ResizedImageRow(blob.id, ok = true, Some(w.toLong), Some(h.toLong),
            Some(png.length.toLong), Some(rs), Some(gs), Some(bs), Some(ls),
            Some(png))
        }
      })
      .toDF()
  }

  // ---------------------------------------------------- GIF frames

  case class GifFrameRow(id: Long, frame_idx: Long, width: Long,
                         height: Long, r_sum: Long, g_sum: Long,
                         b_sum: Long, lum_sum: Long)

  /** Per-frame decode of (possibly animated) GIFs through the ImageIO
    * reader index: one output row per decoded frame, up to `maxFrames`
    * evenly taken from the front (raw frame rasters; GIF disposal
    * compositing is not applied — this is the feature-extraction seam,
    * not a player). Non-GIF/undecodable blobs produce no rows. The
    * row-multiplying step is bounded by maxFrames and stays
    * partition-local.
    */
  def decodeGifFrames(df: DataFrame, idCol: String, binCol: String,
                      maxFrames: Int): DataFrame = {
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        if (blob.bytes == null || blob.bytes.length < 6 ||
            !(blob.bytes(0) == 'G' && blob.bytes(1) == 'I' &&
              blob.bytes(2) == 'F')) Iterator.empty
        else {
          val in = ImageIO.createImageInputStream(
            new ByteArrayInputStream(blob.bytes))
          val readers = ImageIO.getImageReaders(in)
          if (!readers.hasNext) { in.close(); Iterator.empty }
          else {
            val reader = readers.next()
            try {
              reader.setInput(in, false, true)
              val n = reader.getNumImages(true)
              (0 until math.min(n, maxFrames)).iterator.map { i =>
                val img = reader.read(i)
                val w = img.getWidth; val h = img.getHeight
                val argb = img.getRGB(0, 0, w, h, null, 0, w)
                var rs = 0L; var gs = 0L; var bs = 0L; var ls = 0L
                var j = 0
                while (j < argb.length) {
                  val p = argb(j)
                  val r = (p >>> 16) & 0xFF; val g = (p >>> 8) & 0xFF
                  val b = p & 0xFF
                  rs += r; gs += g; bs += b; ls += luma(r, g, b)
                  j += 1
                }
                GifFrameRow(blob.id, i.toLong, w.toLong, h.toLong, rs, gs,
                  bs, ls)
              }.toVector.iterator
            } catch { case _: Exception => Iterator.empty }
            finally { reader.dispose(); in.close() }
          }
        }
      })
      .toDF()
  }

  case class GifFrameHashRow(id: Long, frame_idx: Long, dhash: String)

  /** Per-frame perceptual dHash of (possibly animated) GIF clips — the
    * VIDEO half of the near-dup fingerprint family: one row per
    * decoded frame with the same (gw−1)·gh '0'/'1' difference hash
    * [[dhashImages]] computes for stills (default 9×8 → 64 bits), so
    * a clip becomes a SET of frame fingerprints and clip-level
    * near-dup is set overlap ([[Dedup.setJaccardPairs]]) — robust to
    * re-encoding, uniform brightness shifts (dHash invariance),
    * frame drops and frame re-ordering, which byte-level and
    * single-image dedup all miss. Non-GIF/undecodable blobs produce
    * no rows ([[decodeGifFrames]]' fail-closed rule); frames smaller
    * than the grid are skipped.
    *
    * Scale shape: partition-local decode bounded by maxFrames, one
    * row per frame, no shuffle — the map-only stage before the
    * clip-level set join.
    */
  def dhashGifFrames(df: DataFrame, idCol: String, binCol: String,
                     maxFrames: Int, gridW: Int = 9,
                     gridH: Int = 8): DataFrame = {
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    require(gridW >= 2 && gridH >= 1,
      s"grid must be at least 2x1, got ${gridW}x$gridH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        if (blob.bytes == null || blob.bytes.length < 6 ||
            !(blob.bytes(0) == 'G' && blob.bytes(1) == 'I' &&
              blob.bytes(2) == 'F')) Iterator.empty
        else {
          val in = ImageIO.createImageInputStream(
            new ByteArrayInputStream(blob.bytes))
          val readers = ImageIO.getImageReaders(in)
          if (!readers.hasNext) { in.close(); Iterator.empty }
          else {
            val reader = readers.next()
            try {
              reader.setInput(in, false, true)
              val n = reader.getNumImages(true)
              (0 until math.min(n, maxFrames)).iterator.flatMap { i =>
                val img = reader.read(i)
                if (img.getWidth < gridW || img.getHeight < gridH) None
                else Some(GifFrameHashRow(blob.id, i.toLong,
                  dhashOf(img, gridW, gridH)))
              }.toVector.iterator
            } catch { case _: Exception => Iterator.empty }
            finally { reader.dispose(); in.close() }
          }
        }
      })
      .toDF()
  }

  /** A complete (optionally animated) GIF89a written with the
    * "uncompressed LZW" technique: minimum code size 7 makes every
    * LZW code exactly one byte (codes 0..127 = literal palette
    * indices, 0x80 = Clear, 0x81 = End), and a Clear is emitted before
    * the dictionary could force a code-width increase — so the stream
    * is VALID LZW that any conforming decoder (ImageIO included)
    * decompresses, while every pixel's palette index sits at a FIXED
    * byte offset: pixel i of frame f at
    * 397 + f·(npix+15) + 13 + i (0-based, 128-entry global table),
    * with the palette entry k's RGB at 13 + 3k. That fixed layout is
    * what lets the q119 oracle replay a real GIF decode byte-by-byte
    * while the engine runs the actual LZW decoder.
    *
    * Frames are full-size palette-index rasters (≤ 120 pixels each so
    * one Clear covers the whole frame and one sub-block carries it).
    */
  def encodeGifUncompressed(width: Int, height: Int,
                            palette: Seq[(Int, Int, Int)],
                            frames: Seq[Array[Byte]]): Array[Byte] = {
    val npix = width * height
    require(width >= 1 && height >= 1 && npix <= 120,
      s"uncompressed-LZW fixture frames hold <= 120 px, got $npix")
    require(palette.length == 128, s"need 128 entries, got ${palette.length}")
    require(frames.nonEmpty && frames.forall(_.length == npix),
      "each frame must carry width*height palette indices")
    require(frames.forall(_.forall(b => (b & 0xFF) < 128)),
      "palette indices must be < 128")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    out.write(0xF6) // GCT present, 8-bit color res, 2^7 = 128 entries
    out.write(0); out.write(0)
    palette.foreach { case (r, g, b) =>
      out.write(r & 0xFF); out.write(g & 0xFF); out.write(b & 0xFF)
    }
    frames.foreach { px =>
      out.write(0x2C); le16(0); le16(0); le16(width); le16(height)
      out.write(0) // no local table, not interlaced
      out.write(7) // LZW minimum code size
      out.write(npix + 2) // one sub-block: Clear + pixels + End
      out.write(0x80)
      out.write(px)
      out.write(0x81)
      out.write(0) // block terminator
    }
    out.write(0x3B)
    out.toByteArray
  }

  // ---------------------------------------------------- WAV PCM decode

  case class WavPcmRow(id: Long, ok: Boolean, n_samples: Option[Long],
                       peak_abs: Option[Long], sum_sq: Option[Long])

  /** Canonical-layout PCM16 WAV writer (44-byte header + LE16 samples)
    * — the encode half of [[decodeWavPcm16]]'s contract and the
    * fixture source for its oracle (sample bytes sit at fixed offsets,
    * so DuckDB replays the decode by substring arithmetic). `samples`
    * are interleaved channel values in −32768..32767.
    */
  def encodeWavPcm16(samples: Seq[Int], channels: Int = 2,
                     sampleRate: Int = 44100): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(samples.forall(v => v >= Short.MinValue && v <= Short.MaxValue),
      "samples must fit s16")
    val nBytes = samples.length * 2
    def le16(v: Int) = Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val byteRate = sampleRate * channels * 2
    (("RIFF".getBytes("US-ASCII").toSeq ++ le32(36 + nBytes) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(byteRate) ++ le16(channels * 2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(nBytes) ++
      samples.flatMap(v => le16(v & 0xFFFF))).toArray)
  }

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** REAL PCM sample decode over the canonical WAV layout
    * ([[Multimodal.wavChannels]]'s contract: RIFF/WAVE, fmt first,
    * then `data`): 16-bit little-endian signed samples from byte 44,
    * n_samples = min(declared data size, bytes present) / 2 (channels
    * interleaved — sample count is frames × channels), peak_abs =
    * max |v|, sum_sq = Σ v² (exact int64; 2³¹ samples of full-scale
    * fit with > 2⁰ headroom). ok = false for non-WAV, non-PCM,
    * non-16-bit, or truncated-header blobs.
    */
  def decodeWavPcm16(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.map { blob =>
        val b = blob.bytes
        val n = pcm16SampleCount(b)
        if (n < 0) WavPcmRow(blob.id, ok = false, None, None, None)
        else {
          var peak = 0L; var ss = 0L
          var i = 0
          while (i < n) {
            val v = (leU16(b, 44 + 2 * i).toShort).toInt
            val a = math.abs(v.toLong)
            if (a > peak) peak = a
            ss += v.toLong * v
            i += 1
          }
          WavPcmRow(blob.id, ok = true, Some(n.toLong), Some(peak), Some(ss))
        }
      })
      .toDF()
  }

  /** Clamped sample count of a canonical-layout PCM16 WAV blob, −1
    * when the blob is outside [[decodeWavPcm16]]'s contract (non-WAV,
    * non-PCM, non-16-bit, truncated header). Shared by the whole-blob
    * and windowed decoders so both fail closed identically.
    */
  private def pcm16SampleCount(b: Array[Byte]): Int = {
    val okHeader = b != null && b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
      b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ' &&
      leU16(b, 20) == 1 && leU16(b, 34) == 16 &&
      b(36) == 'd' && b(37) == 'a' && b(38) == 't' && b(39) == 'a'
    if (!okHeader) -1
    else {
      val declared = leU32(b, 40)
      val avail = math.max(0L, b.length.toLong - 44L)
      (math.min(declared, avail) / 2L).toInt
    }
  }

  case class WavWinRow(id: Long, win_idx: Long, n: Long,
                       peak_abs: Long, sum_sq: Long)

  /** Fixed-window PCM energy — the segmentation feature pass of the
    * audio pipeline (frame energy is what voice-activity detection,
    * silence trimming and loudness normalization all threshold on):
    * samples split into consecutive windows of `winSamples`, one row
    * per window with its exact int64 peak and energy (Σv²); the last
    * window may be short (n carries its true size — callers weighting
    * by window must use n, not winSamples). Blobs outside the PCM16
    * contract produce NO rows (fail-closed, the [[decodeWavPcm16]]
    * rule); silence thresholds stay caller-side, over exact integers.
    *
    * Scale shape: `mapPartitions` at the codec boundary only (no
    * Catalyst byte-twiddling equivalent), map-only — one row per
    * window, no shuffle introduced; downstream thresholds/trims are
    * plain Column work.
    */
  def pcmEnergyWindows(df: DataFrame, idCol: String, binCol: String,
                       winSamples: Int): DataFrame = {
    require(winSamples >= 1 && winSamples <= (1 << 20),
      s"winSamples must be 1..${1 << 20}, got $winSamples")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        val b = blob.bytes
        val n = pcm16SampleCount(b)
        if (n <= 0) Iterator.empty
        else (0 until (n + winSamples - 1) / winSamples).iterator.map { w =>
          val from = w * winSamples
          val until = math.min(n, from + winSamples)
          var peak = 0L; var ss = 0L
          var i = from
          while (i < until) {
            val v = (leU16(b, 44 + 2 * i).toShort).toInt
            val a = math.abs(v.toLong)
            if (a > peak) peak = a
            ss += v.toLong * v
            i += 1
          }
          WavWinRow(blob.id, w.toLong, (until - from).toLong, peak, ss)
        }
      })
      .toDF()
  }

  case class WavHashRow(id: Long, ok: Boolean, n_samples: Option[Long],
                        fp: Option[String])

  /** Perceptual audio fingerprint — the acoustic analog of
    * [[dhashImages]] (energy-delta hash in the Haitsma–Kalker 2002
    * robust-hashing family, whole-clip segments instead of STFT
    * bands): the PCM16 stream splits into `nSeg` proportional
    * segments (sample i → segment i·nSeg/n, the dhash grid rule —
    * every segment non-empty when n ≥ nSeg), each segment's energy is
    * the exact int64 Σv², and bit s of the (nSeg−1)-char '0'/'1' hash
    * is '1' iff E(s+1) &gt; E(s). Default nSeg = 65 → the 64-bit
    * fingerprint [[Dedup.hammingPairs]] consumes. Properties that
    * make it a dedup signal, not a checksum: the hash depends only on
    * the clip's energy ENVELOPE shape, so a re-encoded copy (same
    * samples, different container bytes) hashes identically, an
    * exactly gain-scaled copy (every sample × g) hashes identically
    * (energies scale by g² uniformly — comparisons invariant), and a
    * locally perturbed copy flips only the bits whose segments the
    * perturbation touches. Fails closed like [[decodeWavPcm16]]:
    * non-PCM16 blobs AND clips shorter than nSeg samples (a segment
    * would be empty) keep ok = false with a null hash.
    *
    * Scale shape: one partition-local pass at the codec boundary, one
    * row per blob, no shuffle — the map-only stage before the banded
    * pair join, exactly [[dhashImages]]' position in the image chain.
    */
  def energyHashWav(df: DataFrame, idCol: String, binCol: String,
                    nSeg: Int = 65): DataFrame = {
    require(nSeg >= 2 && nSeg <= (1 << 16),
      s"nSeg must be 2..${1 << 16}, got $nSeg")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[MediaBlob]
      .mapPartitions(_.map { blob =>
        val b = blob.bytes
        val n = pcm16SampleCount(b)
        if (n < nSeg) WavHashRow(blob.id, ok = false, None, None)
        else {
          val e = new Array[Long](nSeg)
          var i = 0
          while (i < n) {
            val v = (leU16(b, 44 + 2 * i).toShort).toLong
            // proportional assignment: i*nSeg fits int64 (n <= 2^31,
            // nSeg <= 2^16); each segment gets floor/ceil(n/nSeg) samples
            e(((i.toLong * nSeg) / n).toInt) += v * v
            i += 1
          }
          val out = new java.lang.StringBuilder(nSeg - 1)
          var s = 0
          while (s < nSeg - 1) {
            out.append(if (e(s + 1) > e(s)) '1' else '0')
            s += 1
          }
          WavHashRow(blob.id, ok = true, Some(n.toLong),
            Some(out.toString))
        }
      })
      .toDF()
  }
}
