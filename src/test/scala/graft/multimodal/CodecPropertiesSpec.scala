package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck roundtrip properties for the real codecs — arbitrary
  * dimensions and contents, the generative sibling of the fixed-vector
  * cases in BinaryOpsSpec. Pure JVM (no Spark session): the codecs are
  * plain functions. Same Gen + fixed-seed style as PropertiesSpec (no
  * scalatestplus bridge in the offline cache).
  */
class CodecPropertiesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1337L + i)))

  private val dimGen = Gen.zip(Gen.choose(1, 9), Gen.choose(1, 9))

  test("property: BMP roundtrip is identity for arbitrary dims and bytes") {
    samples(dimGen, 12).foreach { case (w, h) =>
      val px = Array.tabulate(w * h * 3)(i =>
        ((i * 193 + w * 31 + h * 7) % 256).toByte)
      val back = BinaryOps.decodeBmp(BinaryOps.encodeBmp(w, h, px))
      assert(back.exists(d => d.width == w && d.height == h &&
        java.util.Arrays.equals(d.pixels, px)), s"BMP failed at ${w}x$h")
    }
  }

  test("property: PNG roundtrip is identity for arbitrary dims and bytes") {
    samples(dimGen, 12).foreach { case (w, h) =>
      val px = Array.tabulate(w * h * 3)(i =>
        ((i * 89 + w * 13 + h * 3) % 256).toByte)
      val back = BinaryOps.decodePng(BinaryOps.encodePng(w, h, px))
      assert(back.exists(d => d.width == w && d.height == h &&
        java.util.Arrays.equals(d.pixels, px)), s"PNG failed at ${w}x$h")
    }
  }

  test("property: WAV roundtrip is identity for arbitrary rates/channels/samples") {
    val gen = Gen.zip(Gen.choose(1, 3), Gen.choose(0, 200),
      Gen.choose(4000, 48000))
    samples(gen, 12).foreach { case (ch, frames, rate) =>
      val samples0 = Array.tabulate(frames * ch)(i =>
        ((i * striding + rate) % 65536 - 32768).toShort)
      val back = BinaryOps.decodeWav(BinaryOps.encodeWav(rate, ch, samples0))
      if (frames == 0)
        // zero-sample files decode but carry no samples
        assert(back.exists(_.samples.isEmpty))
      else
        assert(back.exists(a => a.sampleRate == rate && a.channels == ch &&
          java.util.Arrays.equals(a.samples.map(_.toInt),
            samples0.map(_.toInt))), s"WAV failed at ch=$ch n=$frames")
    }
  }
  private val striding = 523

  test("property: G.711 WAV roundtrip — decode(encode(x)) is the codec projection") {
    // G.711 is lossy on arbitrary 16-bit input, but idempotent past the
    // first pass: the decoded samples are codewords' expansions, so a
    // second compress→expand must be the identity on them. Also the
    // container roundtrips rate/channels/law exactly.
    val gen = Gen.zip(Gen.choose(1, 3), Gen.choose(1, 200),
      Gen.zip(Gen.choose(4000, 48000), Gen.oneOf(false, true)))
    samples(gen, 12).foreach { case (ch, frames, (rate, aLaw)) =>
      val pcm = Array.tabulate(frames * ch)(i =>
        ((i * 911 + rate) % 65536 - 32768).toShort)
      def wav(s: Array[Short]): Array[Byte] =
        if (aLaw) BinaryOps.encodeWavAlaw(rate, ch, s)
        else BinaryOps.encodeWavUlaw(rate, ch, s)
      val Some((once, law1)) = BinaryOps.decodeWavG711(wav(pcm))
      assert(law1 == (if (aLaw) "alaw" else "ulaw"))
      assert(once.sampleRate == rate && once.channels == ch &&
        once.samples.length == pcm.length)
      val Some((twice, _)) = BinaryOps.decodeWavG711(wav(once.samples))
      assert(java.util.Arrays.equals(
        twice.samples.map(_.toInt), once.samples.map(_.toInt)),
        s"G.711 not idempotent at ch=$ch n=$frames aLaw=$aLaw")
      // and the lossy projection stays within the top segment's step
      // (the coarsest G.711 quantization interval)
      val maxErr = pcm.zip(once.samples)
        .map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 1024, s"quantization error $maxErr out of range")
    }
  }

  test("property: resize then resize-back preserves pixels picked by the mapping") {
    samples(dimGen, 8).foreach { case (w, h) =>
      val px = Array.tabulate(w * h * 3)(i => ((i * 57 + 3) % 256).toByte)
      val img = BinaryOps.BmpImage(w, h, px)
      // upscale by an integer factor then map back: every original
      // pixel is recoverable at (x*f, y*f)
      val f = 3
      val up = BinaryOps.resizeNearest(img, w * f, h * f)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert(up.channel(x * f, y * f, c) == img.channel(x, y, c))
    }
  }
}
