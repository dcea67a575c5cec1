package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = BinaryOps.asMediaTable(
    Seq((1L, "abcdefghij", 300L), (2L, "xy", 10L))
      .toDF("doc_id", "text", "n_chars"))

  test("media table carries binary payload + typed metadata") {
    val r = media.filter($"doc_id" === 1).head()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "abcdefghij".getBytes("UTF-8").toSeq)
    assert(r.getAs[Int]("width") == 300 && r.getAs[Int]("height") == 300 % 480)
  }

  test("decode stub: first bytes scaled to [0,1], zero-padded when short") {
    val feats = BinaryOps.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).features.head == 'a'.toInt / 255.0)
    assert(feats(1L).features.length == BinaryOps.FeatureDim)
    assert(feats(2L).features(2) == 0.0) // "xy" has 2 bytes → padding
  }

  test("batched decode is row-identical to per-row decode (incl. odd batch edges)") {
    val docs = graft.core.Tables.documents(spark, sf0001).limit(150)
    val media = BinaryOps.asMediaTable(docs)
    val perRow = BinaryOps.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val batched = BinaryOps.extractFeaturesBatched(media, batchSize = 7).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(batched == perRow && perRow.size == 150)
  }

  test("BMP roundtrip: encode→decode is identity across padding widths") {
    // width 2 → row 6 bytes → 2 pad bytes; width 4 → 12 → no pad;
    // 1×1 degenerate; tall-thin exercises the bottom-up flip hardest
    for ((w, h) <- Seq((2, 3), (4, 2), (1, 1), (3, 5))) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val img = BinaryOps.decodeBmp(BinaryOps.encodeBmp(w, h, px))
      assert(img.exists(d => d.width == w && d.height == h &&
        java.util.Arrays.equals(d.pixels, px)), s"roundtrip failed at ${w}x$h")
    }
  }

  test("BMP decode rejects malformed payloads instead of throwing") {
    val good = BinaryOps.encodeBmp(2, 2,
      Array.tabulate(12)(i => i.toByte))
    assert(BinaryOps.decodeBmp(null).isEmpty)
    assert(BinaryOps.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
    assert(BinaryOps.decodeBmp("not a bitmap at all, just text!!!!!!!!!!!!!!!!!!!!!!!!"
      .getBytes("UTF-8")).isEmpty)
    assert(BinaryOps.decodeBmp(good.take(30)).isEmpty)     // truncated
    val badBpp = good.clone(); badBpp(28) = 8               // 8bpp
    assert(BinaryOps.decodeBmp(badBpp).isEmpty)
    val compressed = good.clone(); compressed(30) = 1       // BI_RLE8
    assert(BinaryOps.decodeBmp(compressed).isEmpty)
    // and the distributed stats op drops, never dies, on mixed input
    val mixed = Seq((1L, good), (2L, Array[Byte](9, 9)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val ok = BinaryOps.bmpStats(mixed).collect()
    assert(ok.map(_.doc_id).toSeq == Seq(1L))
    assert(ok.head.n_px == 4L)
  }

  test("resizeNearest: identity at same size, known mapping at downscale") {
    val px = Array.tabulate(4 * 2 * 3)(_.toByte)
    val img = BinaryOps.BmpImage(4, 2, px)
    assert(java.util.Arrays.equals(
      BinaryOps.resizeNearest(img, 4, 2).pixels, px))
    // 4x2 → 2x1: sources are floor(x2*4/2)=0,2 at row floor(0*2/1)=0
    val t = BinaryOps.resizeNearest(img, 2, 1)
    assert(t.channel(0, 0, 0) == img.channel(0, 0, 0))
    assert(t.channel(1, 0, 0) == img.channel(2, 0, 0))
    // upscale replicates: 1x1 → 3x3 is nine copies of the pixel
    val one = BinaryOps.BmpImage(1, 1, Array[Byte](7, 8, 9))
    val up = BinaryOps.resizeNearest(one, 3, 3)
    assert((0 until 3).forall(y => (0 until 3).forall(x =>
      up.channel(x, y, 2) == 9)))
  }

  test("dHash: 64 bits, brightness-shift invariant, one-pixel near-dup") {
    def img(f: (Int, Int, Int) => Int, w: Int = 12, h: Int = 10) =
      BinaryOps.BmpImage(w, h, Array.tabulate(w * h * 3) { i =>
        val c = i % 3; val x = (i / 3) % w; val y = i / (3 * w)
        (f(x, y, c) % 256).toByte
      })
    val base = img((x, y, c) => x * x * 5 + y * y * 7 + x * y * 3 + c)
    val h0 = BinaryOps.dHash(base)
    assert(h0.length == 64 && h0.forall(ch => ch == '0' || ch == '1'))
    // identical image → identical hash (hamming 0)
    assert(BinaryOps.dHash(img((x, y, c) => x * x * 5 + y * y * 7 + x * y * 3 + c)) == h0)
    // uniform +40 brightness on every channel → DIFFERENCES unchanged —
    // the property that makes dHash a perceptual hash. Needs a
    // wrap-free fixture (values ≤ 3·11+5·9+2 = 80 < 216, so +40 shifts
    // every luma by the same amount and every comparison is preserved)
    val flat = img((x, y, c) => x * 3 + y * 5 + c)
    val flatBright = img((x, y, c) => x * 3 + y * 5 + c + 40)
    assert(BinaryOps.dHash(flatBright) == BinaryOps.dHash(flat))
    // one perturbed pixel → small hamming (near-dup stays near)
    val pert = img((x, y, c) =>
      if (x == 0 && y == 0 && c == 0) (x * x * 5 + y * y * 7 + c + 64)
      else x * x * 5 + y * y * 7 + x * y * 3 + c)
    val hp = BinaryOps.dHash(pert)
    val dist = h0.zip(hp).count { case (a, b) => a != b }
    assert(dist <= 3, s"one-pixel perturbation moved $dist bits")
    // a structurally different image lands far away
    val other = img((x, y, c) => 251 * x + 127 * y + 17 * c)
    val far = h0.zip(BinaryOps.dHash(other)).count { case (a, b) => a != b }
    assert(far > 3, s"distinct images too close: $far")
  }

  test("dHashes drops malformed payloads and pairs variants via banding") {
    val good = BinaryOps.encodeBmp(3, 2, Array.tabulate(18)(i => (i * 40 % 256).toByte))
    val rows = Seq(
      (1L, good), (2L, good),
      (3L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val hashes = BinaryOps.dHashes(rows).toDF()
    assert(hashes.count() == 2) // malformed dropped, not thrown
    val pairs = graft.dedup.TextDedup.simhashCandidates(
      hashes.withColumnRenamed("dhash", "simhash"), "doc_id",
      maxHamming = 3, bits = 64)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0))) // identical images: hamming 0
  }

  test("dHashes is shuffle-free; capped banding joins hash, never nested-loops") {
    val imgs = (1L to 40L).map { id =>
      (id, BinaryOps.encodeBmp(3, 2,
        Array.tabulate(18)(i => ((id * 13 + i * 40) % 256).toByte)))
    }.toDF("doc_id", "payload")
    val h = BinaryOps.dHashes(imgs).toDF()
    h.collect()
    val hPlan = h.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!hPlan.contains("Exchange"),
      s"hashing must be pure map work:\n$hPlan")
    val pairs = graft.dedup.TextDedup.simhashCandidates(
      h.withColumnRenamed("dhash", "simhash"), "doc_id",
      maxHamming = 3, bits = 64, bucketCap = 4)
    pairs.collect()
    val pPlan = pairs.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!pPlan.contains("CartesianProduct") &&
      !pPlan.contains("BroadcastNestedLoop"),
      s"banding must stay an equi-join:\n$pPlan")
  }

  test("PNG roundtrip exercises all five scanline filters") {
    // heights ≥ 5 force filter types 0..4 (encoder assigns row % 5)
    for ((w, h) <- Seq((1, 5), (3, 7), (4, 6))) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 131 + 17) % 256).toByte)
      val img = BinaryOps.decodePng(BinaryOps.encodePng(w, h, px))
      assert(img.exists(d => d.width == w && d.height == h &&
        java.util.Arrays.equals(d.pixels, px)), s"roundtrip failed at ${w}x$h")
    }
  }

  test("PNG interop: decodes the JDK's own encoder and vice versa") {
    // a symmetric encoder/decoder bug would survive a self-roundtrip;
    // javax.imageio is an INDEPENDENT implementation, so agreement in
    // both directions pins spec conformance (filters, deflate, CRC)
    val (w, h) = (5, 6)
    val px = Array.tabulate(w * h * 3)(i => ((i * 83 + 5) % 256).toByte)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      bi.setRGB(x, y, ((px(o) & 0xff) << 16) | ((px(o + 1) & 0xff) << 8) |
        (px(o + 2) & 0xff))
    }
    val jdkOut = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(bi, "png", jdkOut))
    val mine = BinaryOps.decodePng(jdkOut.toByteArray)
    assert(mine.exists(d => d.width == w && d.height == h &&
      java.util.Arrays.equals(d.pixels, px)),
      "our decoder must read the JDK encoder's PNG")
    val jdkIn = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(BinaryOps.encodePng(w, h, px)))
    assert(jdkIn != null && jdkIn.getWidth == w && jdkIn.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val rgb = jdkIn.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == (px(o) & 0xff) &&
        ((rgb >> 8) & 0xff) == (px(o + 1) & 0xff) &&
        (rgb & 0xff) == (px(o + 2) & 0xff),
        s"JDK decoder must read our PNG at ($x,$y)")
    }
  }

  test("PNG decode rejects malformed payloads instead of throwing") {
    val good = BinaryOps.encodePng(2, 5, Array.tabulate(30)(_.toByte))
    assert(BinaryOps.decodePng(null).isEmpty)
    assert(BinaryOps.decodePng(good.take(20)).isEmpty)      // truncated
    val badCrc = good.clone(); badCrc(badCrc.length - 5) =
      (badCrc(badCrc.length - 5) ^ 0x7f).toByte
    assert(BinaryOps.decodePng(badCrc).isEmpty)             // CRC flip
    val grayscale = good.clone(); grayscale(25) = 0         // color type
    assert(BinaryOps.decodePng(grayscale).isEmpty)          // (CRC fails too)
  }

  test("AVI roundtrip: frames survive the container; malformed rejected") {
    val (w, h) = (3, 2)
    val frames = (0 until 4).map(f =>
      Array.tabulate(w * h * 3)(i => ((f * 61 + i * 7) % 256).toByte))
    val avi = BinaryOps.encodeAvi(w, h, fps = 5, frames)
    val back = BinaryOps.decodeAvi(avi)
    assert(back.exists(v => v.width == w && v.height == h &&
      v.frames.length == 4 &&
      v.frames.zip(frames).forall { case (a, b) =>
        java.util.Arrays.equals(a, b) }))
    assert(BinaryOps.decodeAvi(null).isEmpty)
    assert(BinaryOps.decodeAvi(avi.take(30)).isEmpty)
    assert(BinaryOps.decodeAvi("RIFFxxxxWAVEdata".getBytes).isEmpty)
    // frame-sample stride over the real container
    val media = Seq((1L, avi)).toDF("doc_id", "payload")
    val sampled = BinaryOps.aviFrameSample(media, stride = 2).collect()
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(sampled.forall(p => p.n_frames == 4 && p.width == w))
  }

  test("WAV roundtrip: encode→decode identity; negative samples survive") {
    val samples = Array.tabulate(101)(i => ((i * 997) % 65000 - 32000).toShort)
    val back = BinaryOps.decodeWav(BinaryOps.encodeWav(16000, 1, samples))
    assert(back.exists(a => a.sampleRate == 16000 && a.channels == 1 &&
      java.util.Arrays.equals(
        a.samples.map(_.toInt), samples.map(_.toInt))))
  }

  test("WAV decode chunk-walks past metadata chunks and rejects malformed") {
    val samples = Array[Short](10, -20, 30, -40)
    val wav = BinaryOps.encodeWav(8000, 2, samples)
    // splice a LIST chunk between fmt and data (offset 36), as real
    // recorders emit
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // RIFF size field is now stale, which the walker tolerates
    val back = BinaryOps.decodeWav(spliced)
    assert(back.exists(a => a.channels == 2 &&
      a.samples.toSeq == samples.toSeq))
    assert(BinaryOps.decodeWav(null).isEmpty)
    assert(BinaryOps.decodeWav("RIFFxxxxWAVEbut no chunks".getBytes).isEmpty)
    assert(BinaryOps.decodeWav(wav.take(40)).isEmpty)      // truncated
    val badFmt = wav.clone(); badFmt(20) = 3                // IEEE float
    assert(BinaryOps.decodeWav(badFmt).isEmpty)
    val bad8 = wav.clone(); bad8(34) = 8                    // 8-bit
    assert(BinaryOps.decodeWav(bad8).isEmpty)
  }

  test("G.711 codeword identity: encode(decode(b)) == b for all 256 bytes, both laws") {
    for (b <- 0 until 256) {
      // mu-law's one non-injective point: 0x7F is "negative zero" —
      // it decodes to 0, which canonically re-encodes to 0xFF
      // (positive zero). Every other codeword round-trips exactly.
      val expectU = if (b == 0x7f) 0xff else b
      assert(BinaryOps.linearToUlaw(BinaryOps.ulawToLinear(b)) == expectU, s"ulaw $b")
      // A-law's minimum magnitude is 8, so it has no +-0 collision
      assert(BinaryOps.linearToAlaw(BinaryOps.alawToLinear(b)) == b, s"alaw $b")
    }
  }

  test("G.711 expansion matches javax.sound's own ULAW/ALAW converters") {
    import javax.sound.sampled._
    def jdkExpand(bytes: Array[Byte], enc: AudioFormat.Encoding): Array[Int] = {
      val srcFmt = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dstFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), srcFmt, bytes.length.toLong)
      val out = AudioSystem.getAudioInputStream(dstFmt, src).readAllBytes()
      Array.tabulate(out.length / 2)(i =>
        ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt)
    }
    val all = Array.tabulate(256)(_.toByte)
    val jdkU = jdkExpand(all, AudioFormat.Encoding.ULAW)
    val jdkA = jdkExpand(all, AudioFormat.Encoding.ALAW)
    for (b <- 0 until 256) {
      assert(jdkU(b) == BinaryOps.ulawToLinear(b),
        s"ulaw byte $b: jdk=${jdkU(b)} ours=${BinaryOps.ulawToLinear(b)}")
      assert(jdkA(b) == BinaryOps.alawToLinear(b),
        s"alaw byte $b: jdk=${jdkA(b)} ours=${BinaryOps.alawToLinear(b)}")
    }
  }

  test("G.711 WAV container roundtrip, law tag dispatch, PCM/G.711 exclusion") {
    val g711 = Array.tabulate(101)(j => ((j * 37 + 5) % 256).toByte)
    val uWav = BinaryOps.encodeWavG711(8000, 1, g711, aLaw = false)
    val aWav = BinaryOps.encodeWavG711(16000, 1, g711, aLaw = true)
    val Some((u, uLaw)) = BinaryOps.decodeWavG711(uWav)
    val Some((a, aLaw)) = BinaryOps.decodeWavG711(aWav)
    assert(uLaw == "ulaw" && u.sampleRate == 8000 &&
      u.samples.toSeq == g711.toSeq.map(b => BinaryOps.ulawToLinear(b & 0xff).toShort))
    assert(aLaw == "alaw" && a.sampleRate == 16000 &&
      a.samples.toSeq == g711.toSeq.map(b => BinaryOps.alawToLinear(b & 0xff).toShort))
    // the compress convenience path: lossy on arbitrary input, but
    // expansion of the stored codewords is what decode must return
    val pcm = Array.tabulate(64)(i => ((i * 991) % 60000 - 30000).toShort)
    val Some((rt, _)) = BinaryOps.decodeWavG711(BinaryOps.encodeWavUlaw(8000, 1, pcm))
    assert(rt.samples.toSeq == pcm.toSeq.map(s =>
      BinaryOps.ulawToLinear(BinaryOps.linearToUlaw(s.toInt)).toShort))
    // parsers are mutually exclusive: the PCM walker rejects tag-7
    // payloads, the G.711 walker rejects tag-1
    assert(BinaryOps.decodeWav(uWav).isEmpty)
    assert(BinaryOps.decodeWavG711(BinaryOps.encodeWav(8000, 1, pcm)).isEmpty)
    // malformed: truncation and null never throw
    assert(BinaryOps.decodeWavG711(uWav.take(40)).isEmpty)
    assert(BinaryOps.decodeWavG711(null).isEmpty)
  }

  test("JPEG roundtrip through the JDK codec: exact dims, pixels within tolerance") {
    // smooth grayscale ramp (r=g=b, no mod-256 wrap): quantization
    // error stays small, while stride/flip/channel bugs would blow it
    for ((w, h) <- Seq((9, 11), (16, 8), (10, 13))) {
      val px = Array.tabulate(w * h * 3) { i =>
        val x = (i / 3) % w; val y = i / (3 * w)
        (20 + x * 2 + y * 3).toByte
      }
      val back = BinaryOps.decodeJpeg(BinaryOps.encodeJpeg(w, h, px))
      assert(back.exists(d => d.width == w && d.height == h), s"dims at ${w}x$h")
      val img = back.get
      val maxErr = px.indices.map(i =>
        math.abs((img.pixels(i) & 0xff) - (px(i) & 0xff))).max
      assert(maxErr <= 8, s"maxErr=$maxErr at ${w}x$h")
    }
  }

  test("JPEG decode rejects non-JPEG and corrupt payloads instead of throwing") {
    assert(BinaryOps.decodeJpeg(null).isEmpty)
    assert(BinaryOps.decodeJpeg(Array[Byte](1, 2, 3)).isEmpty)
    // PNG magic is not a JPEG SOI
    val png = BinaryOps.encodePng(2, 5, Array.tabulate(30)(_.toByte))
    assert(BinaryOps.decodeJpeg(png).isEmpty)
    val good = BinaryOps.encodeJpeg(9, 9, Array.fill[Byte](9 * 9 * 3)(50))
    assert(BinaryOps.decodeJpeg(good.take(20)).isEmpty)        // truncated
    val corrupt = good.clone()
    for (i <- good.length / 2 until good.length / 2 + 8)
      corrupt(i) = 0x00 // stomp the entropy stream mid-scan
    // corrupt streams either decode-with-noise or fail — never throw
    BinaryOps.decodeJpeg(corrupt)
  }

  test("M-JPEG AVI: real compressed video frames survive the container") {
    val (w, h, nf) = (11, 9, 4)
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h * 3) { i =>
        val x = (i / 3) % w; val y = i / (3 * w)
        (15 + f * 2 + x * 2 + y * 3).toByte
      }
    }
    val avi = BinaryOps.encodeAviMjpeg(w, h, fps = 10, frames)
    val back = BinaryOps.decodeAvi(avi)
    assert(back.exists(v => v.width == w && v.height == h && v.frames.length == nf))
    val v = back.get
    for (f <- 0 until nf) {
      val maxErr = frames(f).indices.map(i =>
        math.abs((v.frames(f)(i) & 0xff) - (frames(f)(i) & 0xff))).max
      assert(maxErr <= 8, s"frame $f maxErr=$maxErr")
    }
    // a stomped frame chunk rejects the payload rather than throwing
    val dcAt = {
      var idx = -1
      for (i <- 0 until avi.length - 4 if idx < 0)
        if (avi(i) == '0' && avi(i + 1) == '0' && avi(i + 2) == 'd' && avi(i + 3) == 'c')
          idx = i
      idx
    }
    assert(dcAt > 0)
    val stomped = avi.clone(); stomped(dcAt + 8) = 0x00 // kill the SOI
    assert(BinaryOps.decodeAvi(stomped).isEmpty)
    // the frame-sample operator runs over the compressed container too
    val media = Seq((1L, avi)).toDF("doc_id", "payload")
    val sampled = BinaryOps.aviFrameSample(media, stride = 2).collect()
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(sampled.forall(p => p.n_frames == nf && p.width == w))
  }

  test("forged headers can't wrap Int arithmetic past the bounds checks") {
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // BMP: width=1431655768 wraps width*3 to 8, so a 2x2 payload's
    // bounds check passes and the copy loop used to throw AIOOBE
    val bmp = BinaryOps.encodeBmp(2, 2, Array.tabulate(12)(_.toByte))
    val wrapped = bmp.clone(); le32(1431655768).copyToArray(wrapped, 18)
    assert(BinaryOps.decodeBmp(wrapped).isEmpty)
    // PNG: a CRC-valid IHDR with width=0x30000000 wraps the stride
    // negative and used to throw NegativeArraySizeException
    def chunk(kind: String, data: Array[Byte]) = {
      val k = kind.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32; crc.update(k); crc.update(data)
      be32(data.length) ++ k ++ data ++ be32(crc.getValue.toInt)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val bombPng = sig ++
      chunk("IHDR", be32(0x30000000) ++ be32(1) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", Array[Byte](0x78, 0x9c.toByte)) ++ chunk("IEND", Array.empty)
    assert(BinaryOps.decodePng(bombPng).isEmpty)
    // PNG: a chunk length near Int.MaxValue used to wrap the
    // off+12+len bound negative and reach CRC32.update out of range
    val lenBomb = sig ++ be32(0x7ffffff0) ++ "IDAT".getBytes("US-ASCII") ++
      Array.fill[Byte](16)(0)
    assert(BinaryOps.decodePng(lenBomb).isEmpty)
    // AVI: 20k nested LIST headers used to StackOverflowError the
    // recursive walker
    var nested = Array.empty[Byte]
    for (_ <- 0 until 20000)
      nested = "LIST".getBytes("US-ASCII") ++ le32(4 + nested.length) ++
        "recl".getBytes("US-ASCII") ++ nested
    val bombAvi = "RIFF".getBytes("US-ASCII") ++ le32(4 + nested.length) ++
      "AVI ".getBytes("US-ASCII") ++ nested
    assert(BinaryOps.decodeAvi(bombAvi).isEmpty)
    // WAV: a data-chunk size near Int.MaxValue used to wrap the bound
    // negative and attempt a ~4 GB sample allocation
    val wav = BinaryOps.encodeWav(8000, 1, Array[Short](1, 2))
    val wavBomb = wav.clone(); le32(0x7ffffff0).copyToArray(wavBomb, 40)
    assert(BinaryOps.decodeWav(wavBomb).isEmpty)
  }

  test("real extractor dispatches on format: BMP pixels, WAV samples, stub fallback") {
    val px = Array.tabulate(2 * 2 * 3)(i => (10 * i).toByte)
    val samples = Array[Short](100, -200, 300, 0, 1, 2, 3, 4, 5)
    val rows = Seq(
      (1L, BinaryOps.encodeBmp(2, 2, px), "image/bmp", 0, 0),
      (2L, BinaryOps.encodeWav(8000, 1, samples), "audio/wav", 0, 0),
      (3L, "xyz".getBytes("UTF-8"), "fake/raw", 7, 9),
      (4L, Array[Byte](1, 2, 3), "image/bmp", 0, 0), // malformed: dropped
      (5L, BinaryOps.encodeGif(2, 2, px), "image/gif", 0, 0))
      .toDF("doc_id", "payload", "format", "width", "height")
    val out = BinaryOps.extractFeaturesReal(rows).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    // GIF: decoded dims + first pixels / 255 (RGB order — same bytes
    // as the BMP fixture but WITHOUT its BGR swap)
    assert(out(5L).width == 2 && out(5L).height == 2)
    assert(out(5L).features(0) == 0 / 255.0 &&
      out(5L).features(2) == 20 / 255.0)
    // BMP: decoded dims + first pixels / 255
    assert(out(1L).width == 2 && out(1L).height == 2)
    assert(out(1L).features(3) == 30 / 255.0)
    // WAV: PCM scale, negatives preserved
    assert(out(2L).features(1) == -200 / 32768.0)
    // unknown format: the documented stub contract, declared metadata
    assert(out(3L).width == 7 && out(3L).features.head == 'x'.toInt / 255.0)
  }

  test("resize keeps features, changes metadata; frameSample strides") {
    val feats = BinaryOps.extractFeatures(media)
    val resized = BinaryOps.resize(feats, 64, 64).collect().head
    assert(resized.width == 64 && resized.height == 64)
    val sampled = BinaryOps.frameSample(feats, stride = 2)
      .filter($"doc_id" === 1).select($"sampled").as[Array[Double]].head()
    assert(sampled.length == BinaryOps.FeatureDim / 2)
    assert(sampled.head == 'a'.toInt / 255.0 && sampled(1) == 'c'.toInt / 255.0)
  }

  test("GIF roundtrip is lossless, incl. the JDK interlace-bug heights") {
    // heights 2 and 4 come back corrupted when written interlaced
    // (the JDK default) — encodeGif writes non-interlaced exactly so
    // these shapes MUST roundtrip bit-for-bit
    for ((w, h) <- Seq((3, 2), (8, 4), (20, 2), (2, 1), (5, 5), (16, 8))) {
      val px = Array.tabulate(w * h * 3) { i =>
        val x = (i / 3) % w; val y = i / (3 * w)
        ((y * 5 + x * 11) % 256).toByte
      }
      val dec = BinaryOps.decodeGif(BinaryOps.encodeGif(w, h, px)).get
      assert(dec.width == w && dec.height == h)
      assert(dec.pixels.toSeq == px.toSeq, s"${w}x$h")
    }
  }

  test("GIF rejects malformed payloads and over-wide palettes") {
    assert(BinaryOps.decodeGif(null).isEmpty)
    assert(BinaryOps.decodeGif(Array[Byte](1, 2, 3)).isEmpty)
    assert(BinaryOps.decodeGif("GIF8 but garbage".getBytes).isEmpty)
    val good = BinaryOps.encodeGif(2, 2, Array.fill(12)(7.toByte))
    assert(BinaryOps.decodeGif(java.util.Arrays.copyOf(good, 10)).isEmpty,
      "truncated stream must be rejected")
    // 300 distinct colors cannot be palette-encoded
    val wide = Array.tabulate(20 * 15 * 3) { i =>
      val p = i / 3
      (if (i % 3 == 0) p % 256 else p / 256).toByte
    }
    intercept[IllegalArgumentException] {
      BinaryOps.encodeGif(20, 15, wide)
    }
  }

  test("IMA-ADPCM golden decode vectors, incl. both clamp rails") {
    // hand-replayed against the spec arithmetic (nibbles low-first)
    assert(BinaryOps.imaDecodeBlock(0, 0,
      Array(0x71, 0xF8, 0x3C).map(_.toByte)).toSeq ==
      Seq[Short](0, 1, 12, 10, -15, -49, -18))
    // positive clamp: near-rail predictor + max step stays at 32767
    assert(BinaryOps.imaDecodeBlock(32760, 88,
      Array(0x77).map(_.toByte)).toSeq == Seq[Short](32760, 32767, 32767))
    // negative clamp mirrors at -32768
    assert(BinaryOps.imaDecodeBlock(-32760, 88,
      Array(0xFF).map(_.toByte)).toSeq == Seq[Short](-32760, -32768, -32768))
    assert(BinaryOps.ImaStepTable.length == 89 &&
      BinaryOps.ImaStepTable.head == 7 && BinaryOps.ImaStepTable.last == 32767)
  }

  test("IMA-ADPCM encode->decode tracks the signal within the step bound") {
    // encoder state advances through the DECODER arithmetic, so
    // reconstruction error per sample is bounded by the current step;
    // on a smooth ramp the adaptive step stays small
    val n = 321
    val samples = Array.tabulate(n)(i =>
      (2000.0 * math.sin(i / 10.0)).toInt.toShort)
    val (p0, i0, data) = BinaryOps.imaEncodeBlock(samples)
    val decoded = BinaryOps.imaDecodeBlock(p0, i0, data)
    assert(decoded.length == n && decoded(0) == samples(0))
    val maxErr = samples.zip(decoded).map { case (a, b) =>
      math.abs(a - b) }.max
    assert(maxErr <= BinaryOps.ImaStepTable(88) / 4,
      s"unbounded drift: maxErr=$maxErr")
    // smooth signal => tight tracking in practice
    val rms = math.sqrt(samples.zip(decoded).map { case (a, b) =>
      val d = (a - b).toDouble; d * d }.sum / n)
    assert(rms < 100.0, s"rms=$rms")
  }

  test("IMA-ADPCM WAV container roundtrip; malformed payloads reject") {
    val blocks = (0 until 3).map { b =>
      ((b * 1000 - 500).toShort, b * 7,
        Array.tabulate(8)(j => ((b * 31 + j * 13) % 256).toByte))
    }
    val wav = BinaryOps.encodeWavIma(8000, blocks)
    val got = BinaryOps.decodeWavIma(wav).get
    assert(got.sampleRate == 8000 && got.channels == 1)
    // header-only blocks (one sample, zero nibble bytes) are the
    // encoder's own output for single-sample input and must round-trip
    val (p1, i1, d1) = BinaryOps.imaEncodeBlock(Array[Short](1234))
    assert(d1.isEmpty)
    val tiny = BinaryOps.decodeWavIma(
      BinaryOps.encodeWavIma(8000, Seq((p1, i1, d1)))).get
    assert(tiny.samples.toSeq == Seq[Short](1234))
    val expect = blocks.flatMap { case (p, i, d) =>
      BinaryOps.imaDecodeBlock(p, i, d) }
    assert(got.samples.toSeq == expect)
    // the tag-0x11 decoder refuses PCM and G.711 payloads, and the
    // PCM decoder refuses the ADPCM payload (format dispatch is real)
    val pcm = BinaryOps.encodeWav(8000, 1, Array[Short](1, 2, 3))
    assert(BinaryOps.decodeWavIma(pcm).isEmpty)
    assert(BinaryOps.decodeWav(wav).isEmpty)
    assert(BinaryOps.decodeWavIma(
      BinaryOps.encodeWavUlaw(8000, 1, Array[Short](1, 2, 3))).isEmpty)
    // truncated + corrupt-step-index reject instead of throwing
    assert(BinaryOps.decodeWavIma(java.util.Arrays.copyOf(wav, 50)).isEmpty)
    val badIdx = wav.clone
    badIdx(62) = 120.toByte // block 0 header stepIndex > 88
    assert(BinaryOps.decodeWavIma(badIdx).isEmpty)
  }

  test("audioHash: 64 bits, gain-invariant, silence-padded, hamming-local perturbation") {
    def clip(f: Int => Short, n: Int = 260) =
      BinaryOps.WavAudio(8000, 1, Array.tabulate(n)(f))
    val base = clip(j => ((j * j * 7 + j * 13) % 65536 - 32768).toShort)
    val h = BinaryOps.audioHash(base)
    assert(h.length == 64 && h.forall(c => c == '0' || c == '1'))
    // uniform gain cancels: g² scales every frame energy equally
    // (int division truncates, so build the pair as x vs 2x exactly)
    val half = clip(j => (base.samples(j) / 4).toShort)
    val twice = clip(j => (half.samples(j) * 2).toShort)
    assert(BinaryOps.audioHash(half) == BinaryOps.audioHash(twice))
    // a short clip pads with silence: explicit zeros == implicit pad
    val short = clip(j => base.samples(j), n = 100)
    val padded = clip(j => if (j < 100) base.samples(j) else 0.toShort)
    assert(BinaryOps.audioHash(short) == BinaryOps.audioHash(padded))
    // perturbing one sample in frame k can flip only bits k-1 and k
    val pert = clip(j => if (j == 9) 12345.toShort else base.samples(j))
    val hp = BinaryOps.audioHash(pert)
    val flipped = h.zip(hp).zipWithIndex.collect { case ((a, b), i) if a != b => i }
    assert(flipped.forall(i => i == 1 || i == 2), s"flipped bits $flipped")
    // malformed payloads drop from the batched face (decodeWav contract)
    import spark.implicits._
    val media = Seq(
      (1L, BinaryOps.encodeWav(8000, 1, base.samples)),
      (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = BinaryOps.audioHashes(media).collect()
    assert(out.length == 1 && out.head.doc_id == 1L && out.head.ahash == h)
  }
}
