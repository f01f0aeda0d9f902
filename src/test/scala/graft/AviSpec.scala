package graft

import graft.operators.Avi

/** The RIFF/AVI container path: synthesis↔decode round trip against
  * the closed-form pixel function, keyframe argmax against a direct
  * reference computation, and the corruption posture (None, never
  * garbage) across every structural layer. */
class AviSpec extends SparkSessionSpec {

  test("decode round-trips the synthesis: geometry, frames, pixel bytes") {
    for (id <- 0L until 12L) {
      val vp = Avi.decodePixels(Avi.encode(id)).get
      assert(vp.width == Avi.widthOf(id) && vp.height == Avi.heightOf(id))
      assert(vp.frames.length == Avi.framesOf(id))
      for (f <- vp.frames.indices; fr <- 0 until vp.height;
           j <- 0 until vp.width * 3)
        assert(vp.frames(f)(fr * vp.width * 3 + j) == Avi.pixOf(id, f, fr, j),
          s"doc $id frame $f row $fr byte $j")
    }
  }

  test("keyframe = argmax inter-frame |delta|, earliest on ties") {
    for (id <- 0L until 20L) {
      val kf = Avi.decodeKeyframe(id, Avi.encode(id)).get
      val w = Avi.widthOf(id); val h = Avi.heightOf(id)
      val deltas = (1 until Avi.framesOf(id)).map { f =>
        (for (fr <- 0 until h; j <- 0 until w * 3)
          yield math.abs(Avi.pixOf(id, f, fr, j) -
            Avi.pixOf(id, f - 1, fr, j)).toLong).sum
      }
      val bestDelta = deltas.max
      val bestF = deltas.indexOf(bestDelta) + 1
      assert(kf.key_frame == bestF && kf.max_delta == bestDelta,
        s"doc $id: got (${kf.key_frame}, ${kf.max_delta}), " +
          s"want ($bestF, $bestDelta) of $deltas")
    }
  }

  test("malformed containers decode to None, never garbage") {
    val good = Avi.encode(5L)
    assert(Avi.decodePixels(good).isDefined)
    // flipped magic, wrong form type
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Avi.decodePixels(badMagic).isEmpty)
    val badForm = good.clone(); badForm(8) = 'W'.toByte // "WVI "
    assert(Avi.decodePixels(badForm).isEmpty)
    // truncation at every structural layer: header, hdrl, mid-movi,
    // last frame cut
    for (cut <- Seq(3, 11, 20, 80, good.length / 2, good.length - 5))
      assert(Avi.decodePixels(good.take(cut)).isEmpty, s"cut=$cut")
    // a compressed stream (biCompression != 0) must be refused:
    // find the strf chunk and poison its compression field
    def findChunk(id: String): Int = {
      val pat = id.getBytes("US-ASCII")
      (0 until good.length - 4).find(i => pat.indices.forall(k =>
        good(i + k) == pat(k))).get
    }
    val strfAt = findChunk("strf")
    val comp = good.clone(); comp(strfAt + 8 + 16) = 1
    assert(Avi.decodePixels(comp).isEmpty, "compressed stream accepted")
    // frame-size mismatch: shrink the declared 00db length
    val db = findChunk("00db")
    val short = good.clone(); short(db + 4) = (good(db + 4) - 1).toByte
    assert(Avi.decodePixels(short).isEmpty, "frame size mismatch accepted")
    // garbage
    assert(Avi.decodePixels(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(Avi.decodePixels(Array.emptyByteArray).isEmpty)
  }

  test("mm_video and mm_keyframes decode the whole corpus") {
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(Avi.mmVideo(spark, sf0001).count() == n)
    assert(Avi.mmKeyframes(spark, sf0001).count() == n)
  }
}
