package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{Codec, MediaRow}

/** Byte-level codec round-trips: the decoder must recover dimensions,
  * sample rates and frame counts from the payload BYTES alone, and
  * reject malformed containers. */
class MultimodalSpec extends SparkSpecBase {

  test("PPM round-trip: header parsed from bytes, stats over pixels") {
    val w = 7; val h = 5
    val row = MediaRow(42L, "image", w, h, Codec.encodePpm(w, h, 42L))
    val f = Codec.decodeFeatures(row)
    assert(f.parsed_w == w && f.parsed_h == h)
    assert(f.n_units == w * h)
    assert(f.n_bytes == row.payload.length.toLong)
    assert(f.stat_min >= 0 && f.stat_max <= 255 && f.stat_min <= f.stat_max)
    // sum equals a direct recount of the pixel bytes
    val off = row.payload.length - w * h * 3
    val expected = row.payload.drop(off).map(b => (b & 0xff).toLong).sum
    assert(f.stat_sum == expected)
  }

  test("PPM: multi-digit dimensions parse (header is ASCII, not fixed width)") {
    val row = MediaRow(1L, "image", 123, 45, Codec.encodePpm(123, 45, 1L))
    val f = Codec.decodePpm(row)
    assert(f.parsed_w == 123 && f.parsed_h == 45 && f.n_units == 123 * 45)
  }

  test("WAV round-trip: RIFF fields parsed, PCM16 stats") {
    val n = 100
    val row = MediaRow(7L, "audio", 8000, 16, Codec.encodeWav(n, 8000, 7L))
    val f = Codec.decodeFeatures(row)
    assert(f.parsed_w == 8000, "sample rate from fmt chunk")
    assert(f.parsed_h == 16, "bits per sample")
    assert(f.n_units == n)
    assert(f.stat_min >= Short.MinValue && f.stat_max <= Short.MaxValue)
    assert(f.stat_min <= f.stat_max)
  }

  test("GFV1 round-trip: frame count and per-frame PPM parsing") {
    val row = MediaRow(9L, "video", 4, 3, Codec.encodeVideo(6, 4, 3, 9L))
    val f = Codec.decodeFeatures(row)
    assert(f.n_units == 6, "frame count")
    assert(f.parsed_w == 4 && f.parsed_h == 3)
    assert(f.n_bytes == row.payload.length.toLong)
  }

  test("decoder rejects malformed containers") {
    intercept[IllegalArgumentException] {
      Codec.decodeFeatures(MediaRow(0L, "image", 1, 1,
        "JUNKJUNKJUNK".getBytes))
    }
    // truncated PPM: header promises more pixels than present
    val good = Codec.encodePpm(4, 4, 0L)
    intercept[IllegalArgumentException] {
      Codec.decodeFeatures(MediaRow(0L, "image", 4, 4, good.dropRight(1)))
    }
    // WAV with corrupted data-chunk length
    val wav = Codec.encodeWav(10, 8000, 0L)
    wav(40) = (wav(40) + 1).toByte
    intercept[IllegalArgumentException] {
      Codec.decodeFeatures(MediaRow(0L, "audio", 8000, 16, wav))
    }
  }

  test("decode is deterministic: same id, same features") {
    val a = Codec.decodeFeatures(MediaRow(5L, "video", 4, 3,
      Codec.encodeVideo(3, 4, 3, 5L)))
    val b = Codec.decodeFeatures(MediaRow(5L, "video", 4, 3,
      Codec.encodeVideo(3, 4, 3, 5L)))
    assert(a == b)
  }

  test("resizePpm: nearest-neighbor sample, output is a valid P6") {
    val src = Codec.encodePpm(8, 4, 11L)
    val resized = Codec.resizePpm(src, 4, 2)
    val f = Codec.decodePpm(MediaRow(0L, "image", 4, 2, resized))
    assert(f.parsed_w == 4 && f.parsed_h == 2 && f.n_units == 8)
    // pixel (x, y) of the output == pixel (2x, 2y) of the source
    val (_, _, _, so) = Codec.parsePpmHeader(src, 0)
    val (_, _, _, ro) = Codec.parsePpmHeader(resized, 0)
    for (y <- 0 until 2; x <- 0 until 4; ch <- 0 until 3) {
      val s = src(so + ((2 * y) * 8 + 2 * x) * 3 + ch)
      val d = resized(ro + (y * 4 + x) * 3 + ch)
      assert(s == d, s"pixel ($x,$y) channel $ch")
    }
  }

  test("sampleFrames: stride-2 keeps frames 0,2,4; output is valid GFV1") {
    val src = Codec.encodeVideo(5, 4, 3, 13L)
    val sampled = Codec.sampleFrames(src, 2)
    val f = Codec.decodeVideo(MediaRow(0L, "video", 4, 3, sampled))
    assert(f.n_units == 3, "frames 0, 2, 4 kept")
    // kept frame 1 (= source frame 2) must be byte-identical to the
    // source's third frame: both encode seed 13+2
    val direct = Codec.encodePpm(4, 3, 13L + 2)
    val (_, _, _, po) = Codec.parsePpmHeader(sampled, 5)
    val frameLen = po - 5 + 4 * 3 * 3
    val kept1 = java.util.Arrays.copyOfRange(sampled, 5 + frameLen, 5 + 2 * frameLen)
    assert(kept1.sameElements(direct))
  }

  test("q50: transformed media decode cleanly per kind") {
    val rows = SparkEntry.queries("q50_media_pipeline")(spark, sf).collect()
    val byKind = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(3))).toMap
    assert(byKind.keySet == Set("image", "audio", "video"))
    // images: every one is 8x8 after resize -> total_units = 64 * n
    assert(byKind("image")._2 == 64L * byKind("image")._1)
  }

  test("q80: banded pairs equal driver-side all-pairs; planted dups found") {
    import graft.ops.Multimodal.Codec
    val got = SparkEntry.queries("q80_image_dups")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver-side exhaustive recomputation over the same corpus
    val sigs = Multimodal.imageTable(spark, sf).collect()
      .map(r => r.media_id -> Codec.dHashPpm(r.payload)).sortBy(_._1)
    val expected = for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if d <= 3
    } yield (sigs(i)._1, sigs(j)._1, d.toLong)
    assert(got.toSeq == expected.toSeq) // banding is lossless at radius 3
    // the planted dups are all present: 10k+8/10k+9 exact (dist 0),
    // 10k+4/10k+5 near (one pixel -> at most 2 bits)
    val byPair = got.map(t => (t._1, t._2) -> t._3).toMap
    val n = sigs.length
    (0L until n by 10).foreach { base =>
      if (base + 9 < n) assert(byPair((base + 8, base + 9)) == 0L)
      if (base + 5 < n) {
        val d = byPair((base + 4, base + 5))
        assert(d <= 2L, s"near-dup pair ${base + 4}/${base + 5} at $d")
      }
    }
  }

  test("media table: parsed features agree with synthesis metadata") {
    val rows = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val kind = r.getString(1)
      (id % 3) match {
        case 0 =>
          assert(kind == "image")
          assert(r.getInt(3) == (id % 16 + 1).toInt)   // parsed_w
          assert(r.getInt(4) == (id % 12 + 1).toInt)   // parsed_h
        case 1 =>
          assert(kind == "audio")
          assert(r.getInt(3) == 8000)
          assert(r.getLong(5) == id % 256 + 16)        // n_units = samples
        case _ =>
          assert(kind == "video")
          assert(r.getLong(5) == id % 5 + 2)           // n_units = frames
      }
    }
  }
}
