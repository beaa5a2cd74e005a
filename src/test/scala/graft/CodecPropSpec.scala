package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.{Codec, MediaRow}

/** Property-based invariants for the byte-format codecs: every
  * synthesized container decodes to its encoding parameters, resize
  * produces valid containers of the target dimensions with pixels
  * drawn from the source, and frame sampling keeps exactly the
  * stride-selected frames. Pure JVM — no SparkSession. */
class CodecPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(200)
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("PPM encode/decode round-trips any (w, h, seed)") {
    check(Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 30),
        Gen.choose(Long.MinValue, Long.MaxValue)) { (w, h, seed) =>
      val f = Codec.decodePpm(
        MediaRow(0L, "image", w, h, Codec.encodePpm(w, h, seed)))
      f.parsed_w == w && f.parsed_h == h && f.n_units == w.toLong * h &&
        f.stat_min >= 0 && f.stat_max <= 255 && f.stat_min <= f.stat_max
    })
  }

  test("WAV encode/decode round-trips any (n, rate, seed)") {
    check(Prop.forAll(Gen.choose(0, 500), Gen.choose(1, 192000),
        Gen.choose(Long.MinValue, Long.MaxValue)) { (n, rate, seed) =>
      val f = Codec.decodeWav(
        MediaRow(0L, "audio", rate, 16, Codec.encodeWav(n, rate, seed)))
      f.parsed_w == rate && f.parsed_h == 16 && f.n_units == n.toLong &&
        (n == 0 || (f.stat_min >= Short.MinValue &&
          f.stat_max <= Short.MaxValue && f.stat_min <= f.stat_max))
    })
  }

  test("GFV1 encode/decode round-trips any (frames, w, h)") {
    check(Prop.forAll(Gen.choose(1, 20), Gen.choose(1, 8), Gen.choose(1, 8),
        Gen.choose(0L, 1L << 40)) { (frames, w, h, seed) =>
      val f = Codec.decodeVideo(
        MediaRow(0L, "video", w, h, Codec.encodeVideo(frames, w, h, seed)))
      f.n_units == frames.toLong && f.parsed_w == w && f.parsed_h == h
    })
  }

  test("resize always yields a valid PPM of the target size whose pixels come from the source") {
    check(Prop.forAll(Gen.choose(1, 30), Gen.choose(1, 30),
        Gen.choose(1, 30), Gen.choose(1, 30), Gen.choose(0L, 1L << 40)) {
      (w, h, tw, th, seed) =>
        val src = Codec.encodePpm(w, h, seed)
        val out = Codec.resizePpm(src, tw, th)
        val f = Codec.decodePpm(MediaRow(0L, "image", tw, th, out))
        val (_, _, _, so) = Codec.parsePpmHeader(src, 0)
        val srcBytes = src.drop(so).toSet
        val (_, _, _, oo) = Codec.parsePpmHeader(out, 0)
        f.parsed_w == tw && f.parsed_h == th &&
          out.drop(oo).forall(srcBytes.contains)
    })
  }

  test("sampleFrames keeps ceil(frames/stride) frames and stays decodable") {
    check(Prop.forAll(Gen.choose(1, 20), Gen.choose(1, 6),
        Gen.choose(0L, 1L << 40)) { (frames, stride, seed) =>
      val src = Codec.encodeVideo(frames, 3, 2, seed)
      val out = Codec.sampleFrames(src, stride)
      val f = Codec.decodeVideo(MediaRow(0L, "video", 3, 2, out))
      f.n_units == (frames + stride - 1) / stride
    })
  }

  test("ring-key packing is a bijection on random coordinates") {
    // mirrors q51's arithmetic on the JVM: the packed key must decode
    // to the original pair for the full signed 32-bit range
    check(Prop.forAll(Gen.choose(Int.MinValue, Int.MaxValue),
        Gen.choose(Int.MinValue, Int.MaxValue)) { (q, r) =>
      val key = (q.toLong << 32) | (r.toLong & 0xFFFFFFFFL)
      val rLow = java.lang.Math.floorMod(key, 4294967296L)
      val rtQ = ((key - rLow) / 4294967296L).toInt
      val rtR = (if (rLow >= 2147483648L) rLow - 4294967296L else rLow).toInt
      rtQ == q && rtR == r
    })
  }

  test("dHash: any single-byte perturbation moves the hash <= 2 bits") {
    // the q80 near-dup radius rests on this bound: a one-pixel change
    // feeds <= 1 downsampled grid cell, which sits in <= 2 comparisons
    val (w, h) = (16, 12)
    check(Prop.forAll(
        Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.choose(0, w * h * 3 - 1),
        Gen.choose(1, 255)) { (seed, pos, delta) =>
      val base = Codec.encodePpm(w, h, seed)
      val mut = base.clone()
      val off = mut.length - w * h * 3
      mut(off + pos) = ((mut(off + pos) + delta) & 0xff).toByte
      java.lang.Long.bitCount(
        Codec.dHashPpm(base) ^ Codec.dHashPpm(mut)) <= 2
    })
  }

  test("dHash: identical content hashes identically across dimensions") {
    check(Prop.forAll(Gen.choose(9, 40), Gen.choose(8, 30),
        Gen.choose(Long.MinValue, Long.MaxValue)) { (w, h, seed) =>
      val p = Codec.encodePpm(w, h, seed)
      Codec.dHashPpm(p) == Codec.dHashPpm(p.clone())
    })
  }

  test("TopKPairs: agg result equals brute-force top-k on any input split") {
    val agg = new graft.functions.TopKPairs(5)
    val itemGen = Gen.listOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"),
      Gen.choose(0L, 20L)))
    check(Prop.forAll(itemGen, Gen.choose(0, 100)) { (items, cutPct) =>
      val brute = items.sortBy { case (t, n) => (-n, t) }.take(5)
      val cut = items.length * cutPct / 100
      val (l, r) = items.splitAt(cut)
      agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)).items == brute
    })
  }
}
