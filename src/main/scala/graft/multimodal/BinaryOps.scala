package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs as partition-batched JVM code over the binary column (the Scala
  * analogue of a pandas `mapInPandas` batch UDF). SIX codecs are fully
  * REAL here: uncompressed 24-bit BMP and 16-bit PCM WAV (pure byte
  * arithmetic), PNG (8-bit RGB — DEFLATE/CRC32 from java.util.zip plus
  * the five spec scanline filters, interop-verified in both directions
  * against javax.imageio's independent codec), JPEG (the JDK's bundled
  * javax.imageio reader/writer — real Huffman/DCT, gated with a pinned
  * tolerance because the codec is lossy), and AVI video in both
  * uncompressed-DIB ('00db') and M-JPEG ('00dc') profiles (RIFF walker
  * + per-frame decode, so frame-sampling runs on real container
  * bytes), and G.711 mu-law/A-law COMPRESSED audio (the telephony
  * standard; fixed integer expansion tables, cross-checked against
  * javax.sound.sampled's own converters). The m3–m11 gates drive each
  * end-to-end against arithmetic oracles, including real pixel
  * resize. Only codecs genuinely needing native libraries absent from
  * this container (H.264-class video, MP3/AAC perceptual audio) keep
  * the deterministic byte-derived fake below, so their Spark-side
  * contract (schema, partitioning, batch shape, null behavior) stays
  * real and oracle-testable while the codec stays swappable.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); payload bytes never enter a shuffle — feature extraction
  * projects them down to fixed-width vectors first, which is the only
  * sane layout at 100 TB of media.
  */
object BinaryOps {

  val FeatureDim = 8

  /** Crawl-garbage guard shared by every decoder: a forged header with
    * e.g. width = 1431655768 wraps `width * 3` in Int arithmetic to a
    * tiny rowSize that PASSES the payload bounds check, then the pixel
    * copy loop indexes past the wrapped-small array and throws — which
    * the never-throw contract forbids. Capping both dimensions at 2^15
    * (a gigapixel image) keeps every stride/size product inside safe
    * range BEFORE any allocation; the residual products are still
    * compared in Long.
    */
  val MaxDim: Int = 1 << 15

  /** PNG-only cap: unlike BMP/AVI, a PNG's decoded size is NOT bounded
    * by its payload length (DEFLATE), so a tiny forged IHDR could
    * demand a multi-GB raw buffer. 256 MB decoded ≫ any sane corpus
    * image at the supported 8-bit RGB profile.
    */
  val MaxDecodedBytes: Long = 256L << 20

  private def dimsSane(width: Int, height: Int): Boolean =
    width > 0 && height > 0 && width <= MaxDim && height <= MaxDim

  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                               format: String, width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, format: String, width: Int,
                                 height: Int, features: Array[Double])

  /** Wrap a text corpus as a media table: payload = utf-8 bytes,
    * metadata derived deterministically (stands in for real image
    * dimensions).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/raw").as("format"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  // ===== REAL codec: uncompressed 24-bit BMP =====
  // Pure byte arithmetic (little-endian headers, 4-byte row padding,
  // bottom-up row order) — no media library needed, so THIS format's
  // decode path is fully real in this container.

  final case class BmpImage(width: Int, height: Int, pixels: Array[Byte]) {
    /** Channel value (0=B,1=G,2=R) at IMAGE coordinates — (0,0) is the
      * TOP-left pixel (decode un-flips BMP's bottom-up row order).
      */
    def channel(x: Int, y: Int, c: Int): Int =
      pixels((y * width + x) * 3 + c) & 0xff
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Serialize pixels (3 bytes BGR per pixel, image row 0 = top) as an
    * uncompressed 24-bit BMP. Test/fixture synthesis side of
    * [[decodeBmp]].
    */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height * 3,
      s"need $width*$height*3 bytes, got ${pixels.length}")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val imageSize = rowSize * height
    val out = new Array[Byte](54 + imageSize)
    out(0) = 'B'; out(1) = 'M'
    le32(54 + imageSize).copyToArray(out, 2)
    le32(54).copyToArray(out, 10)          // pixel-array offset
    le32(40).copyToArray(out, 14)          // BITMAPINFOHEADER size
    le32(width).copyToArray(out, 18)
    le32(height).copyToArray(out, 22)
    out(26) = 1                            // planes
    out(28) = 24                           // bpp
    // compression 0, remaining header fields 0
    for (y <- 0 until height; x <- 0 until width; c <- 0 until 3)
      // file rows run bottom-up: image row y lands in file row h-1-y
      out(54 + (height - 1 - y) * rowSize + x * 3 + c) =
        pixels((y * width + x) * 3 + c)
    out
  }

  /** Parse an uncompressed 24-bit BMP; None for anything malformed
    * (wrong magic, truncated, compressed, non-24bpp) — crawl-grade
    * payloads carry garbage, and a decoder that throws takes the whole
    * partition down with it.
    */
  def decodeBmp(payload: Array[Byte]): Option[BmpImage] = {
    if (payload == null || payload.length < 54 ||
      payload(0) != 'B' || payload(1) != 'M') return None
    val offset = rdLe32(payload, 10)
    val width = rdLe32(payload, 18)
    val height = rdLe32(payload, 22)
    val bpp = rdLe16(payload, 28)
    val compression = rdLe32(payload, 30)
    if (!dimsSane(width, height) || bpp != 24 || compression != 0)
      return None
    val rowSize = ((width * 3 + 3) / 4) * 4
    if (offset < 54 || offset.toLong + rowSize.toLong * height > payload.length)
      return None
    val px = new Array[Byte](width * height * 3)
    for (y <- 0 until height; x <- 0 until width; c <- 0 until 3)
      px((y * width + x) * 3 + c) =
        payload(offset + (height - 1 - y) * rowSize + x * 3 + c)
    Some(BmpImage(width, height, px))
  }

  final case class BmpStats(doc_id: Long, width: Int, height: Int,
                            p00_b: Int, p00_g: Int, p00_r: Int,
                            pbr_r: Int, sum_r: Long, n_px: Long)

  /** Partition-batched REAL decode over a (doc_id, payload) binary
    * table: dimensions from the header, corner channel probes (the
    * top-left probe proves the bottom-up un-flip, the bottom-right one
    * the row stride/padding), and an integer red-channel sum (exact —
    * no float anywhere, so the oracle compares bit-for-bit). Malformed
    * payloads are dropped, not thrown (the [[decodeBmp]] contract).
    * Same no-shuffle mapPartitions shape as [[extractFeatures]].
    */
  def bmpStats(media: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload"): Dataset[BmpStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeBmp(payload).map { img =>
          var sumR = 0L
          var i = 2
          while (i < img.pixels.length) { sumR += img.pixels(i) & 0xff; i += 3 }
          BmpStats(id, img.width, img.height,
            img.channel(0, 0, 0), img.channel(0, 0, 1), img.channel(0, 0, 2),
            img.channel(img.width - 1, img.height - 1, 2),
            sumR, img.width.toLong * img.height)
        }
      })
  }

  /** REAL pixel resize: nearest-neighbor to (outW, outH) — source
    * index floor(x2·w/outW) per the standard mapping, pure integer
    * arithmetic so it is exactly oracle-able. Nearest-neighbor is the
    * deterministic baseline; interpolating kernels drop in behind the
    * same signature.
    */
  def resizeNearest(img: BmpImage, outW: Int, outH: Int): BmpImage = {
    require(outW > 0 && outH > 0, s"bad target ${outW}x$outH")
    val px = new Array[Byte](outW * outH * 3)
    for (y2 <- 0 until outH; x2 <- 0 until outW; c <- 0 until 3) {
      val sx = x2 * img.width / outW
      val sy = y2 * img.height / outH
      px((y2 * outW + x2) * 3 + c) = img.pixels((sy * img.width + sx) * 3 + c)
    }
    BmpImage(outW, outH, px)
  }

  final case class ResizedProbe(doc_id: Long, src_w: Int, src_h: Int,
                                p00: Int, p_mid: Int, p_last: Int, sum_c0: Long)

  /** Decode (BMP) → REAL resize to a fixed thumbnail → integer probes:
    * corner, center, and last pixel of channel 0 plus the channel-0
    * sum over the thumbnail — the decode+transform pipeline ML
    * ingestion runs, end-to-end on real pixels, no shuffle.
    */
  def resizedStats(media: DataFrame, outW: Int, outH: Int,
                   idCol: String = "doc_id",
                   payloadCol: String = "payload"): Dataset[ResizedProbe] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeBmp(payload).map { src =>
          val t = resizeNearest(src, outW, outH)
          var sum = 0L
          var i = 0
          while (i < t.pixels.length) { sum += t.pixels(i) & 0xff; i += 3 }
          ResizedProbe(id, src.width, src.height,
            t.channel(0, 0, 0), t.channel(outW / 2, outH / 2, 0),
            t.channel(outW - 1, outH - 1, 0), sum)
        }
      })
  }

  // ===== perceptual image hashing (dHash) =====

  final case class DHashRow(doc_id: Long, dhash: String)

  /** 64-bit perceptual DIFFERENCE hash (dHash) of a decoded image —
    * the standard cheap near-dup signal for image corpora: resize to a
    * 9×8 grid (nearest-neighbor, [[resizeNearest]] — pure integer), an
    * integer luma per cell (`(77·R + 150·G + 29·B) >> 8`, the BT.601
    * weights scaled to /256 so the division is exact), then bit(r,c) =
    * luma(c+1,r) > luma(c,r): 8 horizontal comparisons × 8 rows.
    * Robust to uniform brightness shifts (differences cancel) and to
    * resampling (the grid is the resample), which is exactly why dHash
    * beats raw-byte fingerprints for near-dup detection.
    *
    * Emitted as a 64-char bit STRING so it plugs straight into the
    * SimHash pigeonhole banding machinery
    * ([[graft.dedup.TextDedup.simhashCandidates]] with bits = 64):
    * hamming ≤ 3 pairs agree on one of 4 16-bit bands, so candidate
    * generation is an equi-join, never all-pairs — image near-dup at
    * corpus scale rides the same plan shape as text SimHash.
    */
  def dHash(img: BmpImage): String = {
    val t = resizeNearest(img, 9, 8)
    def luma(x: Int, y: Int): Int =
      (77 * t.channel(x, y, 2) + 150 * t.channel(x, y, 1) +
        29 * t.channel(x, y, 0)) >> 8
    val sb = new java.lang.StringBuilder(64)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        sb.append(if (luma(c + 1, r) > luma(c, r)) '1' else '0')
        c += 1
      }
      r += 1
    }
    sb.toString
  }

  /** Partition-batched dHash over a (doc_id, payload) binary table:
    * real BMP decode → [[dHash]]; malformed payloads drop (the
    * [[decodeBmp]] contract). No shuffle — pure per-row map work, so
    * the corpus scan IS the cost at any scale; the banding join
    * downstream is the only exchange in the image-dedup pipeline.
    */
  def dHashes(media: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload"): Dataset[DHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeBmp(payload).map(img => DHashRow(id, dHash(img)))
      })
  }

  // ===== perceptual audio hashing (frame-energy sign hash) =====

  final case class AudioHashRow(doc_id: Long, ahash: String)

  /** 64-bit frame-energy DIFFERENCE hash of decoded PCM — [[dHash]]'s
    * recipe turned to audio (the m13–m15 dedup matrix closing its
    * third modality): the first 65·`frameLen` samples split into 65
    * frames, per-frame energy = Σ s² as an exact int64 (|s| ≤ 32768 ⇒
    * s² ≤ 2³⁰; a frame sum is orders of magnitude under 2⁶³), and
    * bit i = energy(i+1) > energy(i) — 64 ordered comparisons.
    * Uniform GAIN cancels exactly like brightness does for dHash:
    * scaling every sample by g scales every energy by g², and
    * g²e₁ > g²e₀ ⇔ e₁ > e₀ — which is why energy-difference signs
    * beat raw-byte fingerprints for re-encoded/normalized audio.
    * Clips shorter than 65·frameLen pad with silence (zero samples);
    * multi-channel audio hashes the interleaved stream (per-channel
    * variants are a caller-side `samples` slice). All arithmetic is
    * integer-exact, so the hash is SQL-replayable — the m16 oracle
    * restates the fixture's sample formula and this fold verbatim.
    *
    * Emitted as a 64-char bit STRING so it plugs straight into the
    * SimHash pigeonhole banding machinery
    * ([[graft.dedup.TextDedup.simhashCandidates]], bits = 64) — audio
    * near-dup at corpus scale rides the same equi-join plan shape as
    * text SimHash and image dHash.
    */
  def audioHash(audio: WavAudio, frameLen: Int = 4): String = {
    require(frameLen > 0, s"frameLen must be positive: $frameLen")
    def energy(f: Int): Long = {
      var e = 0L
      var j = f * frameLen
      val end = (f + 1) * frameLen
      while (j < end) {
        val s = if (j < audio.samples.length) audio.samples(j).toLong else 0L
        e += s * s
        j += 1
      }
      e
    }
    val sb = new java.lang.StringBuilder(64)
    var prev = energy(0)
    var i = 1
    while (i <= 64) {
      val cur = energy(i)
      sb.append(if (cur > prev) '1' else '0')
      prev = cur
      i += 1
    }
    sb.toString
  }

  /** Partition-batched [[audioHash]] over a (doc_id, payload) binary
    * table: real WAV decode → hash; malformed payloads drop (the
    * [[decodeWav]] contract). Pure per-row map work like [[dHashes]] —
    * the banding join downstream is the pipeline's only exchange.
    */
  def audioHashes(media: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): Dataset[AudioHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeWav(payload).map(a => AudioHashRow(id, audioHash(a)))
      })
  }

  // ===== REAL codec: PNG (8-bit RGB, non-interlaced) =====
  // A genuinely COMPRESSED format handled for real: DEFLATE and CRC32
  // come from java.util.zip (JDK-only), chunk framing and the five
  // scanline filters (None/Sub/Up/Average/Paeth) are implemented per
  // the PNG spec. Supported profile: bit depth 8, color type 2 (RGB),
  // no interlace — the common ML-corpus case; anything else returns
  // None like the other decoders.

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def rdBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def pngChunk(kind: String, data: Array[Byte]): Array[Byte] = {
    val k = kind.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(k); crc.update(data)
    be32(data.length) ++ k ++ data ++ be32(crc.getValue.toInt)
  }

  /** Paeth predictor, verbatim from the PNG spec. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Serialize RGB pixels (3 bytes per pixel, row 0 = top) as a real
    * PNG. Each row carries filter type `row % 5`, so a roundtrip
    * exercises every filter path, and the IDAT stream is genuinely
    * DEFLATE-compressed (java.util.zip.Deflater).
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"need $width*$height*3 bytes, got ${rgb.length}")
    val stride = width * 3
    val raw = new Array[Byte](height * (1 + stride))
    for (y <- 0 until height) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      for (i <- 0 until stride) {
        val cur = rgb(y * stride + i) & 0xff
        val left = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, RGB, deflate, adaptive, no interlace
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.empty)
  }

  /** Parse an 8-bit RGB non-interlaced PNG: chunk walk (CRC-checked),
    * IDAT concatenation, real INFLATE, and the five filter inversions.
    * None for any other profile or malformed payload — never throws.
    * Returns pixels top-down (PNG's native order; no flip, unlike BMP).
    */
  def decodePng(payload: Array[Byte]): Option[BmpImage] = {
    if (payload == null || payload.length < PngSig.length + 12 ||
      !payload.take(8).sameElements(PngSig)) return None
    var off = 8
    var dims: Option[(Int, Int)] = None
    val idat = new java.io.ByteArrayOutputStream
    var done = false
    while (!done && off + 12 <= payload.length) {
      val len = rdBe32(payload, off)
      if (len < 0 || off.toLong + 12 + len > payload.length) return None
      val kind = new String(payload, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(payload, off + 4, 4 + len)
      if (crc.getValue.toInt != rdBe32(payload, off + 8 + len)) return None
      kind match {
        case "IHDR" =>
          if (len != 13 || payload(off + 16) != 8 || payload(off + 17) != 2 ||
            payload(off + 20) != 0) return None
          dims = Some((rdBe32(payload, off + 8), rdBe32(payload, off + 12)))
        case "IDAT" => idat.write(payload, off + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunks (tEXt, pHYs, …) skip
      }
      off += 12 + len
    }
    val (width, height) = dims.getOrElse(return None)
    if (!dimsSane(width, height) || !done) return None
    val stride = width * 3
    // decoded size is header-declared, not payload-bounded (DEFLATE):
    // check it in Long against the cap before any allocation
    if (height.toLong * (1L + stride) > MaxDecodedBytes) return None
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated
        got += n
      }
      if (got != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    val px = new Array[Byte](height * stride)
    for (y <- 0 until height) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      for (i <- 0 until stride) {
        val v = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        px(y * stride + i) = ((v + pred) & 0xff).toByte
      }
    }
    Some(BmpImage(width, height, px)) // same (w, h, top-down bytes) shape
  }

  /** Same stats contract as [[bmpStats]] over PNG payloads — the
    * channel order is RGB here (PNG) vs BGR (BMP), reflected in the
    * gate's column naming.
    */
  def pngStats(media: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload"): Dataset[BmpStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodePng(payload).map { img =>
          var sumLast = 0L
          var i = 2
          while (i < img.pixels.length) { sumLast += img.pixels(i) & 0xff; i += 3 }
          BmpStats(id, img.width, img.height,
            img.channel(0, 0, 0), img.channel(0, 0, 1), img.channel(0, 0, 2),
            img.channel(img.width - 1, img.height - 1, 2),
            sumLast, img.width.toLong * img.height)
        }
      })
  }

  // ===== REAL codec: JPEG (via the JDK's bundled javax.imageio reader) =====
  // The JDK ships an independent JPEG codec in every runtime — no
  // native library needed — so the lossy-image path is real too: real
  // Huffman/DCT decode on the executor, wrapped in the same never-throw
  // contract. Decoded pixels come back in RGB order (like PNG, unlike
  // BMP's BGR). Because JPEG is lossy, its gates compare against the
  // source formula with a pinned tolerance flag rather than exact sums
  // (dimensions and pixel counts stay exact).

  // ImageIO's default stream cache writes temp FILES per decode — a
  // disaster at corpus scale; force the in-memory cache once per JVM.
  private lazy val imageIoNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Serialize RGB pixels as a baseline JPEG at the given quality
    * (fixture-synthesis side of [[decodeJpeg]], like the other
    * encoders — but unlike them the roundtrip is LOSSY by design).
    */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte],
                 quality: Float = 0.95f): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"need $width*$height*3 bytes, got ${rgb.length}")
    imageIoNoCache
    val bi = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) {
      val o = (y * width + x) * 3
      bi.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
        (rgb(o + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Parse a JPEG through the JDK's own reader; None for anything that
    * is not a decodable JPEG (wrong SOI magic, truncated, corrupt
    * entropy stream, dimensions past [[MaxDim]]) — the reader's
    * exceptions are absorbed into the never-throw contract. Pixels
    * come back top-down in RGB channel order.
    */
  def decodeJpeg(payload: Array[Byte]): Option[BmpImage] = {
    if (payload == null || payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    imageIoNoCache
    try {
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (bi == null || !dimsSane(bi.getWidth, bi.getHeight)) None
      else {
        val w = bi.getWidth; val h = bi.getHeight
        val px = new Array[Byte](w * h * 3)
        val row = new Array[Int](w)
        for (y <- 0 until h) {
          bi.getRGB(0, y, w, 1, row, 0, w)
          for (x <- 0 until w) {
            val rgb = row(x); val o = (y * w + x) * 3
            px(o) = ((rgb >> 16) & 0xff).toByte
            px(o + 1) = ((rgb >> 8) & 0xff).toByte
            px(o + 2) = (rgb & 0xff).toByte
          }
        }
        Some(BmpImage(w, h, px))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Serialize RGB pixels as a GIF (fixture-synthesis side of
    * [[decodeGif]]). GIF is palette-indexed, so the image must use
    * ≤ 256 distinct colors; the encoder builds the EXACT palette from
    * the input (never the writer's quantizer), which makes the
    * round-trip LOSSLESS — unlike JPEG, decoded pixels are gated with
    * integer-exact oracles, the m3/m5 contract.
    */
  def encodeGif(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"need $width*$height*3 bytes, got ${rgb.length}")
    imageIoNoCache
    val colors = new java.util.LinkedHashMap[Integer, Integer]()
    val idx = new Array[Byte](width * height)
    var i = 0
    while (i < width * height) {
      val o = i * 3
      val c = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
        (rgb(o + 2) & 0xff)
      var k = colors.get(c)
      if (k == null) {
        k = colors.size()
        require(k < 256, "GIF needs <= 256 distinct colors")
        colors.put(c, k)
      }
      idx(i) = k.toByte
      i += 1
    }
    val n = colors.size()
    val (rs, gs, bs) = (new Array[Byte](n), new Array[Byte](n), new Array[Byte](n))
    colors.forEach((c, k) => {
      rs(k) = ((c >> 16) & 0xff).toByte
      gs(k) = ((c >> 8) & 0xff).toByte
      bs(k) = (c & 0xff).toByte
    })
    val cm = new java.awt.image.IndexColorModel(8, n, rs, gs, bs)
    val bi = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = bi.getRaster
    var p = 0
    while (p < width * height) {
      raster.setSample(p % width, p / width, 0, idx(p) & 0xff)
      p += 1
    }
    // the JDK writer INTERLACES by default, and the JDK reader
    // mis-decodes interlaced images whose heights leave interlace
    // passes empty (measured: h=2 and h=4 come back with only pass-1
    // rows; h=1,3,5+ are fine) — write non-interlaced explicitly
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val out = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Parse a GIF through the JDK's own reader (first frame); None for
    * anything that is not a decodable GIF (wrong GIF8 magic,
    * truncated, corrupt LZW, dimensions past [[MaxDim]]) — the
    * never-throw contract. Pixels top-down, RGB channel order.
    */
  def decodeGif(payload: Array[Byte]): Option[BmpImage] = {
    if (payload == null || payload.length < 6 ||
      payload(0) != 'G' || payload(1) != 'I' || payload(2) != 'F' ||
      payload(3) != '8') return None
    imageIoNoCache
    try {
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (bi == null || !dimsSane(bi.getWidth, bi.getHeight)) None
      else {
        val w = bi.getWidth; val h = bi.getHeight
        val px = new Array[Byte](w * h * 3)
        val row = new Array[Int](w)
        for (y <- 0 until h) {
          bi.getRGB(0, y, w, 1, row, 0, w)
          for (x <- 0 until w) {
            val rgb = row(x); val o = (y * w + x) * 3
            px(o) = ((rgb >> 16) & 0xff).toByte
            px(o + 1) = ((rgb >> 8) & 0xff).toByte
            px(o + 2) = (rgb & 0xff).toByte
          }
        }
        Some(BmpImage(w, h, px))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  final case class GifStats(doc_id: Long, width: Int, height: Int,
                            p00_r: Int, p00_g: Int, p00_b: Int,
                            pbr_r: Int, sum_r: Long, n_px: Long)

  /** Partition-batched REAL GIF decode with integer-EXACT probes (the
    * format is lossless, so unlike [[jpegStats]] there is no tolerance
    * band): corner channels catch stride/flip/palette bugs, the
    * red-channel sum catches index slips. Malformed payloads drop.
    * Pixel layout is RGB (ImageIO), not BMP's BGR.
    */
  def gifStats(media: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload"): Dataset[GifStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeGif(payload).map { img =>
          var sumR = 0L
          var i = 0
          while (i < img.pixels.length) { sumR += img.pixels(i) & 0xff; i += 3 }
          GifStats(id, img.width, img.height,
            img.channel(0, 0, 0), img.channel(0, 0, 1), img.channel(0, 0, 2),
            img.channel(img.width - 1, img.height - 1, 0),
            sumR, img.width.toLong * img.height)
        }
      })
  }

  final case class JpegProbe(doc_id: Long, width: Int, height: Int,
                             n_px: Long, decode_ok: Boolean)

  /** Partition-batched REAL JPEG decode, gated with a pinned-tolerance
    * comparison instead of exact sums (the codec is lossy): dimensions
    * and pixel count must be exact, and every decoded channel value
    * must land within `tol` of the caller-supplied expected image. A
    * wrong stride, row flip, or channel swap blows the tolerance
    * instantly; codec quantization noise does not. Malformed payloads
    * report decode_ok=false (never thrown). No shuffle.
    */
  def jpegProbe(media: DataFrame, expected: Long => BmpImage, tol: Int,
                idCol: String = "doc_id",
                payloadCol: String = "payload"): Dataset[JpegProbe] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val exp = expected(id)
        decodeJpeg(payload) match {
          case Some(img) =>
            val dimsOk = img.width == exp.width && img.height == exp.height
            var maxErr = 0
            if (dimsOk) {
              var i = 0
              while (i < img.pixels.length) {
                val e = math.abs((img.pixels(i) & 0xff) - (exp.pixels(i) & 0xff))
                if (e > maxErr) maxErr = e
                i += 1
              }
            }
            JpegProbe(id, img.width, img.height,
              img.width.toLong * img.height, dimsOk && maxErr <= tol)
          case None => JpegProbe(id, -1, -1, -1L, decode_ok = false)
        }
      })
  }

  // ===== REAL codec: 16-bit PCM WAV =====
  // RIFF/WAVE container with fmt + data chunks, raw little-endian
  // 16-bit samples — byte arithmetic like BMP, so the audio decode
  // path is also fully real in this container.

  final case class WavAudio(sampleRate: Int, channels: Int,
                            samples: Array[Short])

  /** Serialize 16-bit PCM samples (interleaved if channels > 1). */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 &&
      samples.length % channels == 0,
      s"bad wav shape: rate=$sampleRate ch=$channels n=${samples.length}")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    le32(36 + dataSize).copyToArray(out, 4)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    le32(16).copyToArray(out, 16)          // fmt chunk size
    out(20) = 1                            // PCM
    out(22) = channels.toByte
    le32(sampleRate).copyToArray(out, 24)
    le32(sampleRate * channels * 2).copyToArray(out, 28) // byte rate
    out(32) = (channels * 2).toByte        // block align
    out(34) = 16                           // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    le32(dataSize).copyToArray(out, 40)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Parse a 16-bit PCM WAV; None for anything malformed (wrong magic,
    * truncated, compressed, non-16-bit) — same never-throw contract as
    * [[decodeBmp]]. Chunk-walks from `fmt `, so extra chunks between
    * fmt and data (LIST/INFO metadata, common in the wild) parse fine.
    */
  def decodeWav(payload: Array[Byte]): Option[WavAudio] = {
    if (payload == null || payload.length < 44 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' ||
      payload(3) != 'F' || payload(8) != 'W' || payload(9) != 'A' ||
      payload(10) != 'V' || payload(11) != 'E') return None
    var off = 12
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    while (off + 8 <= payload.length) {
      val id = new String(payload, off, 4, "US-ASCII")
      val size = rdLe32(payload, off + 4)
      if (size < 0 || off.toLong + 8 + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16 || rdLe16(payload, off + 8) != 1 ||
            rdLe16(payload, off + 8 + 14) != 16) return None
          fmt = Some((rdLe32(payload, off + 8 + 4), rdLe16(payload, off + 8 + 2)))
        case "data" =>
          val (rate, ch) = fmt.getOrElse(return None)
          if (rate <= 0 || ch <= 0 || size % 2 != 0) return None
          val n = size / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((payload(off + 8 + 2 * i) & 0xff) |
              (payload(off + 8 + 2 * i + 1) << 8)).toShort
            i += 1
          }
          return Some(WavAudio(rate, ch, samples))
        case _ => // skip LIST/INFO/etc.
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  final case class WavStats(doc_id: Long, sample_rate: Int, channels: Int,
                            n_samples: Long, first_sample: Int,
                            last_sample: Int, sum_abs: Long, peak: Int)

  /** Partition-batched REAL audio decode: format metadata, first/last
    * sample probes (endianness + data-offset bugs show here), integer
    * absolute-amplitude sum and peak (exact — no float). Malformed
    * payloads are dropped, never thrown. No shuffle.
    */
  def wavStats(media: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload"): Dataset[WavStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeWav(payload).filter(_.samples.nonEmpty).map { a =>
          var sumAbs = 0L; var peak = 0
          var i = 0
          while (i < a.samples.length) {
            val v = math.abs(a.samples(i).toInt)
            sumAbs += v; if (v > peak) peak = v
            i += 1
          }
          WavStats(id, a.sampleRate, a.channels, a.samples.length.toLong,
            a.samples.head.toInt, a.samples.last.toInt, sumAbs, peak)
        }
      })
  }

  // ===== REAL codec: G.711 mu-law / A-law COMPRESSED audio =====
  // The telephony-standard 2:1 log-companded encodings, carried in the
  // same RIFF/WAVE container as PCM but with format tag 7 (mu-law) or
  // 6 (A-law) and 8 bits per sample. Both expansions are fixed
  // 256-entry integer tables (CCITT G.711), stated here as arithmetic
  // so the DuckDB oracle can restate them bit-exactly — and the JDK
  // ships the SAME encodings in javax.sound.sampled
  // (AudioFormat.Encoding.ULAW/ALAW), which the spec cross-checks
  // against sample-for-sample. This shrinks the fake-codec boundary to
  // formats with no JDK decoder at all (MP3/AAC, H.264).

  /** Expand one mu-law byte (0-255) to its 16-bit linear sample —
    * CCITT G.711 arithmetic: complement, then mantissa<<3 + bias
    * shifted by the 3-bit exponent.
    */
  def ulawToLinear(b: Int): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Expand one A-law byte (0-255) to its 16-bit linear sample —
    * CCITT G.711: xor 0x55, segment-0/1 special-cased, sign bit SET
    * means positive.
    */
  def alawToLinear(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    val t0 = (a & 0x0f) << 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case _ => (t0 + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  private val UlawClip = 8159 // 14-bit domain clip (CCITT)

  /** Compress one 16-bit linear sample to its mu-law byte (the exact
    * inverse of [[ulawToLinear]]: encode(decode(b)) == b for all 256
    * byte values, spec-verified).
    */
  def linearToUlaw(pcm: Int): Int = {
    var p = pcm >> 2 // 16 -> 14 bit
    val mask = if (p < 0) { p = -p; 0x7f } else 0xff
    if (p > UlawClip) p = UlawClip
    p += 0x84 >> 2
    var seg = 0
    while (seg < 8 && p > ((0x3f << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else (((seg << 4) | ((p >> (seg + 1)) & 0x0f)) ^ mask) & 0xff
  }

  /** Compress one 16-bit linear sample to its A-law byte (exact
    * inverse of [[alawToLinear]] on the 256 codewords).
    */
  def linearToAlaw(pcm: Int): Int = {
    var p = pcm >> 3 // 16 -> 13 bit
    val mask = if (p >= 0) 0xd5 else { p = -p - 1; 0x55 }
    if (p > 0xfff) p = 0xfff
    var seg = 0
    while (seg < 8 && p > ((0x1f << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      val mant = if (seg < 2) (p >> 1) & 0x0f else (p >> seg) & 0x0f
      (((seg << 4) | mant) ^ mask) & 0xff
    }
  }

  /** Compress a 16-bit sample array to G.711 bytes. */
  def encodeUlaw(samples: Array[Short]): Array[Byte] =
    samples.map(s => linearToUlaw(s.toInt).toByte)
  def encodeAlaw(samples: Array[Short]): Array[Byte] =
    samples.map(s => linearToAlaw(s.toInt).toByte)

  /** Wrap raw G.711 bytes in a RIFF/WAVE container: format tag 7
    * (mu-law) or 6 (A-law), 8 bits/sample, the standard 18-byte fmt
    * (cbSize = 0) plus the fact chunk compressed formats carry.
    */
  def encodeWavG711(sampleRate: Int, channels: Int, g711: Array[Byte],
                    aLaw: Boolean): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && g711.length % channels == 0,
      s"bad g711 shape: rate=$sampleRate ch=$channels n=${g711.length}")
    val dataSize = g711.length
    val pad = dataSize & 1 // RIFF chunks are word-aligned
    // RIFF hdr 12 + fmt (8+18) + fact (8+4) + data hdr 8
    val out = new Array[Byte](12 + 26 + 12 + 8 + dataSize + pad)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    le32(out.length - 8).copyToArray(out, 4)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    le32(18).copyToArray(out, 16)
    out(20) = if (aLaw) 6 else 7            // wFormatTag
    out(22) = channels.toByte
    le32(sampleRate).copyToArray(out, 24)
    le32(sampleRate * channels).copyToArray(out, 28) // byte rate (1 B/sample)
    out(32) = channels.toByte               // block align
    out(34) = 8                             // bits per sample
    // bytes 36-37: cbSize = 0
    "fact".getBytes("US-ASCII").copyToArray(out, 38)
    le32(4).copyToArray(out, 42)
    le32(dataSize / channels).copyToArray(out, 46) // samples per channel
    "data".getBytes("US-ASCII").copyToArray(out, 50)
    le32(dataSize).copyToArray(out, 54)
    g711.copyToArray(out, 58)
    out
  }

  /** Convenience compress path: 16-bit linear in, G.711 WAV out. */
  def encodeWavUlaw(sampleRate: Int, channels: Int,
                    samples: Array[Short]): Array[Byte] =
    encodeWavG711(sampleRate, channels, encodeUlaw(samples), aLaw = false)
  def encodeWavAlaw(sampleRate: Int, channels: Int,
                    samples: Array[Short]): Array[Byte] =
    encodeWavG711(sampleRate, channels, encodeAlaw(samples), aLaw = true)

  /** Parse a G.711 WAV (format tag 6 or 7, 8-bit) and EXPAND to 16-bit
    * linear samples; None for anything else — same never-throw,
    * chunk-walking contract as [[decodeWav]]. Also returns which law
    * the payload carried.
    */
  def decodeWavG711(payload: Array[Byte]): Option[(WavAudio, String)] = {
    if (payload == null || payload.length < 44 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' ||
      payload(3) != 'F' || payload(8) != 'W' || payload(9) != 'A' ||
      payload(10) != 'V' || payload(11) != 'E') return None
    var off = 12
    var fmt: Option[(Int, Int, Boolean)] = None // (rate, ch, aLaw)
    while (off + 8 <= payload.length) {
      val id = new String(payload, off, 4, "US-ASCII")
      val size = rdLe32(payload, off + 4)
      if (size < 0 || off.toLong + 8 + size > payload.length) return None
      id match {
        case "fmt " =>
          val tag = if (size >= 16) rdLe16(payload, off + 8) else -1
          if (size < 16 || (tag != 6 && tag != 7) ||
            rdLe16(payload, off + 8 + 14) != 8) return None
          fmt = Some((rdLe32(payload, off + 8 + 4),
            rdLe16(payload, off + 8 + 2), tag == 6))
        case "data" =>
          val (rate, ch, aLaw) = fmt.getOrElse(return None)
          if (rate <= 0 || ch <= 0) return None
          val samples = new Array[Short](size)
          var i = 0
          while (i < size) {
            val b = payload(off + 8 + i) & 0xff
            samples(i) = (if (aLaw) alawToLinear(b) else ulawToLinear(b)).toShort
            i += 1
          }
          return Some((WavAudio(rate, ch, samples),
            if (aLaw) "alaw" else "ulaw"))
        case _ => // skip fact/LIST/etc.
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  final case class G711Stats(doc_id: Long, codec: String, sample_rate: Int,
                             channels: Int, n_samples: Long,
                             first_sample: Int, last_sample: Int,
                             sum_abs: Long, peak: Int)

  /** Partition-batched G.711 decode+expand: [[wavStats]]'s probe set
    * plus the law tag. Integer-exact — the expansion is a fixed table,
    * so the oracle states it arithmetically.
    */
  def g711Stats(media: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): Dataset[G711Stats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeWavG711(payload).filter(_._1.samples.nonEmpty).map {
          case (a, law) =>
            var sumAbs = 0L; var peak = 0
            var i = 0
            while (i < a.samples.length) {
              val v = math.abs(a.samples(i).toInt)
              sumAbs += v; if (v > peak) peak = v
              i += 1
            }
            G711Stats(id, law, a.sampleRate, a.channels,
              a.samples.length.toLong, a.samples.head.toInt,
              a.samples.last.toInt, sumAbs, peak)
        }
      })
  }

  // ===== REAL codec: IMA ADPCM (DVI; WAV format tag 0x11) =====
  // One more genuinely compressed-audio rung implementable from spec
  // in pure integer arithmetic (IMA "Recommended Practices for
  // Enhancing Digital Audio Compatibility", 1992): 4 bits/sample
  // adaptive differential PCM. Every step is integer shifts/adds over
  // an 89-entry step table, so the DuckDB oracle replays the decode
  // state machine exactly (recursive CTE, one sample per step) and the
  // m12 gate is integer-EXACT like m11 — no tolerance band. The JDK
  // ships NO ADPCM codec, so unlike G.711 there is no javax.sound
  // cross-check; the spec instead pins encode→decode round-trip error
  // to the quantizer's step bound and golden-decodes a fixed vector.

  /** IMA step-size table (89 entries, spec Table 2). */
  val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** Step-index adjustment per nibble magnitude (spec Table 1). */
  val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode one 4-bit nibble against (predictor, stepIndex) state —
    * the spec's integer reconstruction: diff = step/8 + bit-gated
    * step, step/2, step/4; sign bit 8 subtracts; predictor clamps to
    * int16; index moves by [[ImaIndexTable]] clamped to [0, 88].
    */
  def imaStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(idx)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + ImaIndexTable(nibble & 7)))
    (p, i)
  }

  /** Decode one mono IMA block body: the 4-byte header's predictor is
    * sample 0, then each data byte carries two nibbles LOW FIRST (the
    * WAV tag-0x11 layout). Emits `1 + 2·data.length` samples.
    */
  def imaDecodeBlock(pred0: Short, idx0: Int,
                     data: Array[Byte]): Array[Short] = {
    require(idx0 >= 0 && idx0 <= 88, s"step index out of range: $idx0")
    val out = new Array[Short](1 + 2 * data.length)
    out(0) = pred0
    var pred = pred0.toInt
    var idx = idx0
    var j = 0
    while (j < data.length) {
      val b = data(j) & 0xff
      val (p1, i1) = imaStep(pred, idx, b & 0x0f)
      out(1 + 2 * j) = p1.toShort
      val (p2, i2) = imaStep(p1, i1, (b >> 4) & 0x0f)
      out(2 + 2 * j) = p2.toShort
      pred = p2; idx = i2
      j += 1
    }
    out
  }

  /** Encode mono 16-bit PCM as one IMA block: the standard feedback
    * quantizer — each nibble is chosen greedily bit-by-bit against the
    * current step, then the state advances through the DECODER's
    * arithmetic ([[imaStep]]), so encoder and decoder predictors never
    * drift. Returns (header predictor, header index, nibble bytes);
    * `samples` must have odd length ≥ 1 (1 header sample + 2/byte).
    */
  def imaEncodeBlock(samples: Array[Short],
                     idx0: Int = 0): (Short, Int, Array[Byte]) = {
    require(samples.nonEmpty && samples.length % 2 == 1,
      s"mono IMA block needs odd sample count, got ${samples.length}")
    require(idx0 >= 0 && idx0 <= 88, s"step index out of range: $idx0")
    val data = new Array[Byte]((samples.length - 1) / 2)
    var pred = samples(0).toInt
    var idx = idx0
    var k = 0
    while (k < samples.length - 1) {
      val step = ImaStepTable(idx)
      var diff = samples(1 + k) - pred
      var nib = 0
      if (diff < 0) { nib = 8; diff = -diff }
      if (diff >= step) { nib |= 4; diff -= step }
      if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) nib |= 1
      val (p, i) = imaStep(pred, idx, nib)
      pred = p; idx = i
      if ((k & 1) == 0) data(k / 2) = nib.toByte
      else data(k / 2) = (data(k / 2) | (nib << 4)).toByte
      k += 1
    }
    (samples(0), idx0, data)
  }

  /** Wrap mono IMA blocks in RIFF/WAVE: format tag 0x11, 4 bits per
    * sample, the 20-byte fmt (cbSize = 2 carrying wSamplesPerBlock)
    * plus the fact chunk. Every block must be (blockAlign − 4) data
    * bytes; `blocks` = (predictor, stepIndex, data) triples.
    */
  def encodeWavIma(sampleRate: Int,
                   blocks: Seq[(Short, Int, Array[Byte])]): Array[Byte] = {
    require(sampleRate > 0 && blocks.nonEmpty, "need rate > 0 and >= 1 block")
    val nData = blocks.head._3.length
    require(blocks.forall(_._3.length == nData),
      "all blocks must share one blockAlign")
    val blockAlign = 4 + nData
    val samplesPerBlock = 1 + 2 * nData
    val dataSize = blocks.length * blockAlign
    val pad = dataSize & 1
    // RIFF hdr 12 + fmt (8+20) + fact (8+4) + data hdr 8
    val out = new Array[Byte](12 + 28 + 12 + 8 + dataSize + pad)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    le32(out.length - 8).copyToArray(out, 4)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    le32(20).copyToArray(out, 16)
    out(20) = 0x11                           // wFormatTag = IMA ADPCM
    out(22) = 1                              // mono
    le32(sampleRate).copyToArray(out, 24)
    // byte rate for tag 0x11: rate * blockAlign / samplesPerBlock
    le32((sampleRate.toLong * blockAlign / samplesPerBlock).toInt)
      .copyToArray(out, 28)
    out(32) = (blockAlign & 0xff).toByte
    out(33) = ((blockAlign >> 8) & 0xff).toByte
    out(34) = 4                              // bits per sample
    out(36) = 2                              // cbSize = 2
    out(38) = (samplesPerBlock & 0xff).toByte
    out(39) = ((samplesPerBlock >> 8) & 0xff).toByte
    "fact".getBytes("US-ASCII").copyToArray(out, 40)
    le32(4).copyToArray(out, 44)
    le32(blocks.length * samplesPerBlock).copyToArray(out, 48)
    "data".getBytes("US-ASCII").copyToArray(out, 52)
    le32(dataSize).copyToArray(out, 56)
    var off = 60
    blocks.foreach { case (pred, idx, data) =>
      out(off) = (pred & 0xff).toByte
      out(off + 1) = ((pred >> 8) & 0xff).toByte
      out(off + 2) = idx.toByte
      out(off + 3) = 0
      data.copyToArray(out, off + 4)
      off += blockAlign
    }
    out
  }

  /** Parse a mono IMA-ADPCM WAV (format tag 0x11, 4-bit) and decode to
    * 16-bit linear — same never-throw chunk-walking contract as
    * [[decodeWav]]. The data chunk must be whole blocks of fmt's
    * blockAlign; each block header re-seeds the (predictor, index)
    * state, so blocks decode independently.
    */
  def decodeWavIma(payload: Array[Byte]): Option[WavAudio] = {
    if (payload == null || payload.length < 44 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' ||
      payload(3) != 'F' || payload(8) != 'W' || payload(9) != 'A' ||
      payload(10) != 'V' || payload(11) != 'E') return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, blockAlign, samplesPerBlock)
    while (off + 8 <= payload.length) {
      val id = new String(payload, off, 4, "US-ASCII")
      val size = rdLe32(payload, off + 4)
      if (size < 0 || off.toLong + 8 + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 20 || rdLe16(payload, off + 8) != 0x11 ||
            rdLe16(payload, off + 8 + 2) != 1 ||           // mono only
            rdLe16(payload, off + 8 + 14) != 4) return None
          // align == 4 is legitimate: a header-only block carries one
          // sample and zero nibble bytes — imaEncodeBlock emits it for
          // a single-sample input, so the decoder must round-trip it
          val align = rdLe16(payload, off + 8 + 12)
          val spb = rdLe16(payload, off + 8 + 18)
          if (align < 4 || spb != 1 + 2 * (align - 4)) return None
          fmt = Some((rdLe32(payload, off + 8 + 4), align, spb))
        case "data" =>
          val (rate, align, spb) = fmt.getOrElse(return None)
          if (rate <= 0 || size % align != 0) return None
          val nBlocks = size / align
          val samples = new Array[Short](nBlocks * spb)
          var b = 0
          while (b < nBlocks) {
            val base = off + 8 + b * align
            val pred0 = ((payload(base) & 0xff) |
              (payload(base + 1) << 8)).toShort
            val idx0 = payload(base + 2) & 0xff
            if (idx0 > 88) return None
            val data = java.util.Arrays.copyOfRange(
              payload, base + 4, base + align)
            imaDecodeBlock(pred0, idx0, data).copyToArray(samples, b * spb)
            b += 1
          }
          return Some(WavAudio(rate, 1, samples))
        case _ => // skip fact/LIST/etc.
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  final case class AdpcmStats(doc_id: Long, codec: String, sample_rate: Int,
                              channels: Int, n_samples: Long,
                              first_sample: Int, last_sample: Int,
                              sum_abs: Long, peak: Int)

  /** Partition-batched IMA-ADPCM decode: [[g711Stats]]'s probe set
    * over the tag-0x11 decoder. Integer-exact — the oracle replays the
    * per-nibble state machine with a recursive CTE.
    */
  def adpcmStats(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): Dataset[AdpcmStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeWavIma(payload).filter(_.samples.nonEmpty).map { a =>
          var sumAbs = 0L; var peak = 0
          var i = 0
          while (i < a.samples.length) {
            val v = math.abs(a.samples(i).toInt)
            sumAbs += v; if (v > peak) peak = v
            i += 1
          }
          AdpcmStats(id, "ima_adpcm", a.sampleRate, a.channels,
            a.samples.length.toLong, a.samples.head.toInt,
            a.samples.last.toInt, sumAbs, peak)
        }
      })
  }

  // ===== REAL codec: AVI (uncompressed DIB or M-JPEG 'vids' stream) =====
  // The video face: a RIFF container (WAV's framing) holding either
  // raw DIB frames (BMP's pixel layout — bottom-up rows, 4-byte
  // padding, '00db' chunks) or M-JPEG frames ('00dc' chunks, each a
  // complete JPEG decoded via the JDK codec), so real frame extraction
  // composes the parsers above — including a genuinely COMPRESSED
  // video profile. Supported: one 24-bit video stream per file.

  /** Serialize frames (each `width*height*3` BGR bytes, row 0 = top)
    * as an uncompressed AVI: RIFF('AVI ') → LIST(hdrl: avih +
    * LIST(strl: strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) →
    * LIST(movi: '00db' DIB frames).
    */
  private def aviChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val padded = if (data.length % 2 == 1) data :+ 0.toByte else data
    id.getBytes("US-ASCII") ++ le32(data.length) ++ padded
  }
  private def aviList(kind: String, body: Array[Byte]): Array[Byte] =
    "LIST".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      kind.getBytes("US-ASCII") ++ body

  /** RIFF('AVI ') scaffolding shared by the DIB and M-JPEG encoders:
    * hdrl (avih + strl(strh 'vids'/fcc + strf BITMAPINFOHEADER)) and a
    * movi list of the already-encoded frame chunk bodies.
    */
  private def aviContainer(width: Int, height: Int, fps: Int, fcc: String,
                           biCompression: Array[Byte], frameChunkId: String,
                           frameBodies: Seq[Array[Byte]]): Array[Byte] = {
    val maxFrame = frameBodies.map(_.length).max
    val avih = le32(1000000 / fps) ++ le32(maxFrame * fps) ++ le32(0) ++
      le32(0) ++ le32(frameBodies.length) ++ le32(0) ++ le32(1) ++
      le32(maxFrame) ++ le32(width) ++ le32(height) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes("US-ASCII") ++ fcc.getBytes("US-ASCII") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frameBodies.length) ++ le32(maxFrame) ++ le32(-1) ++ le32(0) ++
      le32(0) ++ le32(0)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      Array[Byte](1, 0, 24, 0) ++ biCompression ++ le32(maxFrame) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = aviList("hdrl", aviChunk("avih", avih) ++
      aviList("strl", aviChunk("strh", strh) ++ aviChunk("strf", strf)))
    val movi = aviList("movi",
      frameBodies.toArray.flatMap(f => aviChunk(frameChunkId, f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  def encodeAvi(width: Int, height: Int, fps: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty &&
      frames.forall(_.length == width * height * 3),
      s"need nonempty $width*$height*3 frames")
    val rowSize = ((width * 3 + 3) / 4) * 4
    def dib(rgb: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](rowSize * height)
      for (y <- 0 until height; x <- 0 until width; c <- 0 until 3)
        out((height - 1 - y) * rowSize + x * 3 + c) =
          rgb((y * width + x) * 3 + c)
      out
    }
    aviContainer(width, height, fps, "DIB ", le32(0), "00db", frames.map(dib))
  }

  /** COMPRESSED video for real: an M-JPEG AVI — the same RIFF
    * container, fcc 'MJPG', each '00dc' chunk a complete baseline JPEG
    * ([[encodeJpeg]], so the JDK's codec does the entropy coding).
    */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
                     frames: Seq[Array[Byte]],
                     quality: Float = 0.95f): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty &&
      frames.forall(_.length == width * height * 3),
      s"need nonempty $width*$height*3 frames")
    aviContainer(width, height, fps, "MJPG",
      "MJPG".getBytes("US-ASCII"), "00dc",
      frames.map(encodeJpeg(width, height, _, quality)))
  }

  final case class AviVideo(width: Int, height: Int,
                            frames: IndexedSeq[Array[Byte]])

  /** Parse an AVI: chunk-walk to hdrl's avih for the dimensions, then
    * collect the movi list's frames — '00db' DIB frames un-padded and
    * un-flipped like a BMP pixel array (BGR order), '00dc' M-JPEG
    * frames decoded through [[decodeJpeg]] (RGB order). None for any
    * other profile or malformed payload — never throws.
    */
  def decodeAvi(payload: Array[Byte]): Option[AviVideo] = {
    if (payload == null || payload.length < 24 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' ||
      payload(3) != 'F' || new String(payload, 8, 4, "US-ASCII") != "AVI ")
      return None
    var width = -1; var height = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // Iterative chunk walk with an explicit segment stack: a crafted
    // payload of nested 12-byte LIST headers would recurse
    // ~payload.length/12 deep and StackOverflowError a recursive walk —
    // heap-allocated segments make nesting depth a non-issue. Each
    // stack entry is a (cursor, end, inMovi) segment; one chunk is
    // consumed per iteration, LISTs push their body as a new segment.
    def walk(from: Int, to: Int): Boolean = {
      val stack = scala.collection.mutable.ArrayBuffer((from, to, false))
      while (stack.nonEmpty) {
        val (off, end, inMovi) = stack.last
        if (off + 8 > end) stack.dropRightInPlace(1)
        else {
          val id = new String(payload, off, 4, "US-ASCII")
          val size = rdLe32(payload, off + 4)
          if (size < 0 || off.toLong + 8 + size > end) return false
          stack(stack.length - 1) = (off + 8 + size + (size & 1), end, inMovi)
          if (id == "LIST") {
            if (size < 4) return false
            val kind = new String(payload, off + 8, 4, "US-ASCII")
            stack += ((off + 12, off + 8 + size, inMovi || kind == "movi"))
          } else if (id == "avih") {
            if (size < 40) return false
            width = rdLe32(payload, off + 8 + 32)
            height = rdLe32(payload, off + 8 + 36)
          } else if (inMovi && id == "00db") {
            if (!dimsSane(width, height)) return false
            val rowSize = ((width * 3 + 3) / 4) * 4
            if (size.toLong != rowSize.toLong * height) return false
            val px = new Array[Byte](width * height * 3)
            for (y <- 0 until height; x <- 0 until width; c <- 0 until 3)
              px((y * width + x) * 3 + c) =
                payload(off + 8 + (height - 1 - y) * rowSize + x * 3 + c)
            frames += px
          } else if (inMovi && id == "00dc") {
            // M-JPEG frame: the chunk body is a complete JPEG stream
            // (pixels come back RGB, vs BGR for DIB frames); decoded
            // dims must agree with the avih header or the payload lies
            if (!dimsSane(width, height)) return false
            decodeJpeg(java.util.Arrays.copyOfRange(
              payload, off + 8, off + 8 + size)) match {
              case Some(img) if img.width == width && img.height == height =>
                frames += img.pixels
              case _ => return false
            }
          }
        }
      }
      true
    }
    if (!walk(12, math.min(payload.length, 8 + rdLe32(payload, 4))))
      return None
    if (width <= 0 || height <= 0 || frames.isEmpty) None
    else Some(AviVideo(width, height, frames.toIndexedSeq))
  }

  final case class FrameProbe(doc_id: Long, frame_idx: Int, width: Int,
                              height: Int, n_frames: Long, p00_b: Int,
                              sum_b: Long)

  /** REAL video frame-sampling: decode the AVI, keep every `stride`-th
    * frame, emit per-frame integer probes — the stride-sampling stage
    * of video-corpus ingestion running on real container bytes.
    * Malformed payloads drop; no shuffle.
    */
  def aviFrameSample(media: DataFrame, stride: Int,
                     idCol: String = "doc_id",
                     payloadCol: String = "payload"): Dataset[FrameProbe] = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeAvi(payload).iterator.flatMap { v =>
          (0 until v.frames.length by stride).iterator.map { fi =>
            val f = v.frames(fi)
            var sumB = 0L
            var i = 0
            while (i < f.length) { sumB += f(i) & 0xff; i += 3 }
            FrameProbe(id, fi, v.width, v.height, v.frames.length.toLong,
              f(0) & 0xff, sumB)
          }
        }
      })
  }

  /** ===== STUB: deterministic fake decoder =====
    * A real implementation would decode the codec here (H.264, MP3 —
    * the formats that DO need native libs; BMP/PNG/JPEG/WAV/AVI are
    * real above) and emit pixel/sample features. The fake maps the first
    * [[FeatureDim]] payload bytes to [0,1] doubles — deterministic,
    * cross-engine reproducible, and shape-identical to a real decoder.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] =
    Array.tabulate(FeatureDim)(i =>
      if (i < payload.length) (payload(i) & 0xff) / 255.0 else 0.0)

  /** REAL media-features extraction: dispatches on the `format` column
    * to the real decoder — BMP pixels (dims come from the DECODED
    * header, proving the parse) normalized /255, WAV samples
    * normalized /32768 (true PCM scale) — and falls back to the
    * deterministic stub for formats this container can't decode (the
    * documented swappable-codec contract). Rows whose payload fails
    * its declared codec are dropped, never thrown. Same
    * mapPartitions/no-shuffle shape as the stub path: decode stays
    * embarrassingly parallel and payload bytes never enter a shuffle.
    */
  def extractFeaturesReal(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "format", "width", "height")
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        r.format match {
          case "image/bmp" => decodeBmp(r.payload).map { img =>
            MediaFeatures(r.doc_id, r.format, img.width, img.height,
              Array.tabulate(FeatureDim)(i =>
                if (i < img.pixels.length) (img.pixels(i) & 0xff) / 255.0
                else 0.0))
          }
          case "audio/wav" => decodeWav(r.payload).map { a =>
            MediaFeatures(r.doc_id, r.format, 0, 0,
              Array.tabulate(FeatureDim)(i =>
                if (i < a.samples.length) a.samples(i) / 32768.0 else 0.0))
          }
          case "image/gif" => decodeGif(r.payload).map { img =>
            MediaFeatures(r.doc_id, r.format, img.width, img.height,
              Array.tabulate(FeatureDim)(i =>
                if (i < img.pixels.length) (img.pixels(i) & 0xff) / 255.0
                else 0.0))
          }
          case _ => Some(MediaFeatures(r.doc_id, r.format, r.width, r.height,
            decodeStub(r.payload)))
        }
      })
  }

  /** Partition-batched decode / feature extraction (no shuffle). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "format", "width", "height")
      .as[MediaRecord]
      .mapPartitions(_.map(r =>
        MediaFeatures(r.doc_id, r.format, r.width, r.height, decodeStub(r.payload))))
  }

  /** ===== STUB: batch decoder =====
    * Real codecs (and any GPU/SIMD feature extractor) want BATCHES, not
    * rows — this is the Scala analogue of a pandas `mapInPandas` batch
    * UDF: the partition iterator is chunked, the whole chunk is handed
    * to the (stubbed) codec at once, results stream back out. Output is
    * row-for-row identical to [[extractFeatures]].
    */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "format", "width", "height")
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // a real implementation decodes `batch` in one codec/device call
        val decoded = batch.map(r => decodeStub(r.payload))
        batch.lazyZip(decoded).map { (r, f) =>
          MediaFeatures(r.doc_id, r.format, r.width, r.height, f)
        }
      })
  }

  /** Stub resize: metadata-only transform (a real one would re-decode;
    * the contract — new dims, same features — is what downstream sees).
    */
  def resize(features: Dataset[MediaFeatures], w: Int, h: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map(f => f.copy(width = w, height = h))
  }

  /** Frame sampling stub for video-like payloads: every `stride`-th
    * feature, padded — fixed output arity like a real frame sampler.
    */
  def frameSample(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val sampled = f.features.indices.collect {
        case i if i % stride == 0 => f.features(i)
      }.toArray
      (f.doc_id, sampled)
    }.toDF("doc_id", "sampled")
  }
}
