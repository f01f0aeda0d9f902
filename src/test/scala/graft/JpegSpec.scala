package graft

import graft.operators.Jpeg

/** The JPEG codec path: the oracle corpus pins the DC pipeline
  * closed-form (driver gate), so this spec covers what the oracle
  * cannot — the AC/zigzag/run-length machinery against an independent
  * reference IDCT, the canonical Huffman construction, and the
  * corruption posture (None, never garbage). */
class JpegSpec extends SparkSessionSpec {

  /** Independent reference IDCT (direct T.81 A.3.3 double sum,
    * written separately from the decoder's). Natural-order
    * dequantized input. */
  private def refIdct(f: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        s += cu * cv * f(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      out(y * 8 + x) =
        math.max(0, math.min(255, math.rint(s / 4 + 128).toInt))
    }
    out
  }

  test("canonical Huffman codes are prefix-free and round-trip") {
    for ((bits, vals) <- Seq((Jpeg.DcBits, Jpeg.DcVals),
                             (Jpeg.AcBits, Jpeg.AcVals))) {
      val codes = Jpeg.canonicalCodes(bits, vals)
      assert(codes.map(_._1).toSet.size == codes.length)
      // prefix-freedom: no code is a prefix of a longer one
      val asStr = codes.map { case (_, c, l) =>
        String.format("%" + l + "s", Integer.toBinaryString(c))
          .replace(' ', '0')
      }
      for (a <- asStr; b <- asStr if a != b)
        assert(!b.startsWith(a), s"$a prefixes $b")
    }
  }

  test("DC-only decode matches the closed form the oracle replays") {
    for (id <- 0L to 12L) {
      val info = Jpeg.decodeInfo(id, Jpeg.encode(id)).get
      assert(info.width == Jpeg.widthOf(id) &&
        info.height == Jpeg.heightOf(id))
      val nb = (info.width / 8) * (info.height / 8)
      assert(info.n_blocks == nb)
      val want = (0 until nb).map(b => 128 + 2 * Jpeg.dcOf(id, b))
        .sum.toDouble / nb
      assert(math.abs(info.mean_px - want) < 1e-9,
        s"id=$id got ${info.mean_px} want $want")
    }
  }

  test("AC coefficients decode through Huffman/zigzag/IDCT exactly") {
    // two blocks, 16x8: block 0 exercises (run 0, size 1/2) and a
    // run-of-1 and run-of-2 skip; block 1 checks differential DC with
    // ACs present and a negative AC
    val b0 = new Array[Int](64)
    b0(0) = 3      // DC
    b0(1) = 1      // (0,1)
    b0(2) = -2     // (0,2)
    b0(4) = 1      // run 1 → (1,1)
    b0(7) = -1     // run 2 → (2,1)
    val b1 = new Array[Int](64)
    b1(0) = -2     // diff = -5: negative differential DC
    b1(3) = 1      // run 2 → (2,1)
    b1(5) = 3      // run 1, size 2 → 0x12
    val blob = Jpeg.encodeBlocks(16, 8, Array(b0, b1))
    val (w, h, planes) = Jpeg.decodePixels(blob).get
    val img = planes(0)
    assert(w == 16 && h == 8)
    // reference: dequantize in natural order and IDCT independently
    def deq(z: Array[Int]): Array[Int] = {
      val nat = new Array[Int](64)
      for (k <- 0 until 64)
        nat(Jpeg.ZigZag(k)) = z(k) * Jpeg.QuantNat(Jpeg.ZigZag(k))
      nat
    }
    val ref0 = refIdct(deq(b0))
    val ref1 = refIdct(deq(b1))
    for (y <- 0 until 8; x <- 0 until 8) {
      assert(img(y * 16 + x) == ref0(y * 8 + x), s"block0 ($x,$y)")
      assert(img(y * 16 + 8 + x) == ref1(y * 8 + x), s"block1 ($x,$y)")
    }
  }

  test("corrupt and unsupported streams decode to None, never garbage") {
    val good = Jpeg.encode(5L)
    assert(Jpeg.decodeInfo(5L, good).isDefined)
    // flipped magic
    val badMagic = good.clone(); badMagic(1) = 0x00.toByte
    assert(Jpeg.decodeInfo(5L, badMagic).isEmpty)
    // truncation at every prefix must be a clean None (header cuts,
    // mid-entropy cuts, missing EOI)
    for (cut <- Seq(2, 8, 20, good.length / 2, good.length - 3))
      assert(Jpeg.decodeInfo(5L, good.take(cut)).isEmpty, s"cut=$cut")
    // a progressive SOF marker must be refused, not mis-parsed
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeInfo(5L, prog).isEmpty)
    // empty + garbage
    assert(Jpeg.decodeInfo(5L, Array.emptyByteArray).isEmpty)
    assert(Jpeg.decodeInfo(5L, Array.fill(64)(0x55.toByte)).isEmpty)
  }

  test("color 4:4:4 decode: per-plane flat values, AC in every plane") {
    // DC-only color image: every plane must come back flat 128+2*dc
    val good = Jpeg.encodeColor(5L)
    val (w, h, planes) = Jpeg.decodePixels(good).get
    assert(planes.length == 3)
    assert(w == Jpeg.widthOf(5L) && h == Jpeg.heightOf(5L))
    val nb = (w / 8) * (h / 8)
    val dcFns = Seq(Jpeg.dcOf(5L, _: Int), Jpeg.dcCbOf(5L, _: Int),
      Jpeg.dcCrOf(5L, _: Int))
    for (ci <- 0 until 3; b <- 0 until nb) {
      val bx = b % (w / 8); val by = b / (w / 8)
      val want = 128 + 2 * dcFns(ci)(b)
      for (y <- 0 until 8; x <- 0 until 8)
        assert(planes(ci)((by * 8 + y) * w + bx * 8 + x) == want,
          s"plane $ci block $b")
    }
    // AC coefficients decode per-component through the interleaved
    // scan: put a distinct AC in each plane of a 1-MCU image and check
    // against the reference IDCT with each component's quant table
    val zs = Array.tabulate(3) { ci =>
      val z = new Array[Int](64); z(0) = ci - 1; z(1 + ci) = 1; z
    }
    val blob = Jpeg.encodeBlocksMulti(8, 8, zs.map(Array(_)))
    val (_, _, ps) = Jpeg.decodePixels(blob).get
    for (ci <- 0 until 3) {
      val q = if (ci == 0) Jpeg.QuantNat else Jpeg.QuantChromaNat
      val nat = new Array[Int](64)
      for (k <- 0 until 64) nat(Jpeg.ZigZag(k)) = zs(ci)(k) * q(Jpeg.ZigZag(k))
      val ref = refIdct(nat)
      for (i <- 0 until 64)
        assert(ps(ci)(i) == ref(i), s"plane $ci px $i")
    }
    // grayscale consumers refuse color payloads and vice versa
    assert(Jpeg.decodeInfo(5L, good).isEmpty)
    assert(Jpeg.decodeColorInfo(5L, Jpeg.encode(5L)).isEmpty)
    // truncations stay clean None through the color path too
    for (cut <- Seq(2, 30, good.length / 2, good.length - 3))
      assert(Jpeg.decodeColorInfo(5L, good.take(cut)).isEmpty, s"cut=$cut")
    // 4:2:2 (supported nowhere) must be refused at the SOF: patch Y
    // sampling to 0x21 — neither all-1×1 nor the 4:2:0 pattern
    val sub = good.clone()
    val sofAt = (0 until sub.length - 1).find(i =>
      (sub(i) & 0xff) == 0xff && (sub(i + 1) & 0xff) == 0xc0).get
    sub(sofAt + 11) = 0x21.toByte // first component's HiVi
    assert(Jpeg.decodeColorInfo(5L, sub).isEmpty)
  }

  test("color 4:2:0: MCU interleave, quarter-res chroma, upsample exact") {
    (0L until 12L).foreach { id =>
      val (w, h) = (Jpeg.widthOf420(id), Jpeg.heightOf420(id))
      val blob = Jpeg.encodeColor420(id)
      val (dw, dh, planes) = Jpeg.decodePixels(blob).get
      assert(dw == w && dh == h && planes.length == 3, s"doc $id")
      val bwY = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        // luma: flat 128+2·dc over the LUMA raster block grid — pins
        // the 2×2-per-MCU traversal order block by block
        val by = (y / 8) * bwY + (x / 8)
        assert(planes(0)(y * w + x) == 128 + 2 * Jpeg.dcOf(id, by),
          s"doc $id Y ($y,$x)")
        // chroma: quarter-res block grid replicated 2×2 — pins the
        // subsampled decode AND the upsample kernel
        val bc = (y / 16) * (w / 16) + (x / 16)
        assert(planes(1)(y * w + x) == 128 + 2 * Jpeg.dcCbOf(id, bc),
          s"doc $id Cb ($y,$x)")
        assert(planes(2)(y * w + x) == 128 + 2 * Jpeg.dcCrOf(id, bc),
          s"doc $id Cr ($y,$x)")
      }
      // truncations through the 420 path stay clean None
      for (cut <- Seq(20, blob.length / 2, blob.length - 3))
        assert(Jpeg.decodeColorInfo(id, blob.take(cut)).isEmpty)
    }
  }

  test("restart markers: segment resync, DC reset, marker-number cycle") {
    // AC-bearing blocks through every restart interval: restarted
    // streams differ on disk but decode pixel-identically
    val zs = Array.tabulate(6) { b =>
      val z = new Array[Int](64)
      z(0) = b - 2; z(1) = 1; z(5) = -1
      z
    }
    val plain = Jpeg.encodeBlocksMulti(24, 16, Array(zs))
    val (_, _, ref) = Jpeg.decodePixels(plain).get
    for (ri <- 1 to 3) {
      val rst = Jpeg.encodeBlocksMulti(24, 16, Array(zs),
        restartInterval = ri)
      assert(!rst.sameElements(plain), s"ri=$ri must add markers")
      val (w, h, got) = Jpeg.decodePixels(rst).get
      assert(w == 24 && h == 16)
      assert(got(0).sameElements(ref(0)), s"ri=$ri pixels diverge")
    }
    // a misnumbered marker is a hard None (the cycle is verified)
    val rst2 = Jpeg.encodeBlocksMulti(24, 16, Array(zs),
      restartInterval = 2)
    val bad = rst2.clone()
    val at = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xd0).get
    bad(at + 1) = 0xd5.toByte
    assert(Jpeg.decodePixels(bad).isEmpty)
    // truncation inside a later restart segment refuses
    assert(Jpeg.decodePixels(rst2.take(at + 4)).isEmpty)
    // 4:2:0 + restarts compose (predictor resets per component)
    val rst420 = Jpeg.encodeColor420(9L)
    val (wc, hc, pc) = Jpeg.decodePixels(rst420).get
    val with420Rst = Jpeg.encodeBlocksMulti(
      Jpeg.widthOf420(9L), Jpeg.heightOf420(9L),
      {
        val w0 = Jpeg.widthOf420(9L); val h0 = Jpeg.heightOf420(9L)
        val nbY = (w0 / 8) * (h0 / 8); val nbC = (w0 / 16) * (h0 / 16)
        def dcOnly(nb: Int, dc: Int => Int) = Array.tabulate(nb) { b =>
          val z = new Array[Int](64); z(0) = dc(b); z
        }
        Array(dcOnly(nbY, Jpeg.dcOf(9L, _)),
          dcOnly(nbC, Jpeg.dcCbOf(9L, _)),
          dcOnly(nbC, Jpeg.dcCrOf(9L, _)))
      },
      Array(0x22, 0x11, 0x11), restartInterval = 1)
    val (w2, h2, p2) = Jpeg.decodePixels(with420Rst).get
    assert(w2 == wc && h2 == hc)
    for (ci <- 0 until 3)
      assert(p2(ci).sameElements(pc(ci)), s"420+rst plane $ci")
  }

  test("mm_jpeg relation decodes the whole corpus") {
    val df = Jpeg.mmJpeg(spark, sf0001)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(df.count() == n, "every synthesized blob must decode")
  }
}
