package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Multimodal.MediaRow

/** Baseline-sequential JFIF (JPEG) decode — codec path #4 next to
  * WAV/BMP/PNG (Multimodal.scala), covering the one ubiquitous image
  * container those three miss. The decoder is REAL and general for
  * baseline grayscale JFIF: marker/segment parse, DQT (8-bit), SOF0,
  * canonical DHT Huffman tables (ITU T.81 Annex C construction), the
  * byte-stuffed entropy stream, differential DC + run-length AC
  * coefficient decode through the zigzag order, dequantization, a
  * float separable 2-D IDCT (T.81 A.3.3), level shift and clamp.
  * Unsupported shapes (progressive SOF2, multi-component scans,
  * 16-bit DQT, restart markers) and corrupt streams return None —
  * they drop from the relation instead of poisoning it.
  *
  * Synthesis follows the PngEncoder pattern (Multimodal.scala:539):
  * the corpus has no image blobs, so deterministic JPEGs are built in
  * the same mapPartitions pass — one encoder object per partition —
  * from closed-form per-block DC coefficients (AC all zero in the
  * ORACLE corpus). DC-only blocks make the lossy pipeline exactly
  * replayable in SQL: a dequantized DC of q·dc turns into a flat
  * 8×8 block of clamp(128 + round(q·dc/8)) after the IDCT, so with
  * q(0,0)=16 the block value is 128 + 2·dc — integer, no float
  * drift. The AC/zigzag/run-length machinery is spec-gated instead
  * ([[graft.JpegSpec]] drives synthetic AC blocks through the decoder
  * against an independent reference IDCT), because IDCT cosines for
  * AC terms cannot be replayed bit-exactly in DuckDB.
  *
  * Scale posture: identical to the other codecs — decode is a
  * mapPartitions projection at scan speed, one reusable table/LUT
  * set per partition, no shuffle; at 100 TB the codec cost rides the
  * scan. */
object Jpeg {

  /** ITU T.81 Annex K.1 luminance quantization table, natural
    * (row-major) order. Only q(0,0)=16 reaches the oracle closed
    * form; the full table keeps the container honest. */
  val QuantNat: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Chroma quantization table for the color corpus: ITU T.81 Annex
    * K.2 with q(0,0) set to 16 (K.2 has 17 there; 16 keeps the
    * DC-only closed form integer-exact — flat chroma blocks become
    * 128 + 2·dc like luma). A custom table is first-class JPEG: it
    * rides the DQT segment and the decoder uses whatever is declared,
    * so nothing about the codec path is weakened by the choice. */
  val QuantChromaNat: Array[Int] = Array(
    16, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** zigzag→natural index map (T.81 Figure A.6): ZigZag(k) is the
    * natural position of the k-th coefficient in scan order. */
  val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 luminance DC table (BITS, HUFFVAL): categories
    * 0..11. */
  val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcVals: Array[Int] = (0 to 11).toArray

  /** Compact custom AC table — a VALID canonical code covering the
    * (run,size) symbols the synthetic corpora emit: EOB plus small
    * runs/sizes. Custom tables are legal JPEG (the decoder builds
    * whatever the DHT declares); keeping it small keeps the encoder
    * honest about codes it can emit (it throws on an uncovered
    * symbol rather than corrupting the stream). */
  val AcBits: Array[Int] =
    Array(0, 2, 3, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  val AcVals: Array[Int] = Array(0x00, 0x01, 0x11, 0x02, 0x21, 0x31, 0x12)

  /** Canonical code assignment (T.81 Annex C): values in BITS order
    * get consecutive codes per length, doubling between lengths.
    * Returns (value, code, length) triples. */
  def canonicalCodes(bits: Array[Int],
                     vals: Array[Int]): Array[(Int, Int, Int)] = {
    val out = Array.newBuilder[(Int, Int, Int)]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += ((vals(k), code, len))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Coefficient magnitude category (T.81 F.1.2.1.1): the bit count
    * of |v|. */
  def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** Sign-extend `size` raw magnitude bits (T.81 F.12 EXTEND). */
  def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  // ---------------------------------------------------------------
  // bit-level IO with JPEG byte stuffing
  // ---------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    private def emit(b: Int): Unit = {
      out.write(b)
      if ((b & 0xff) == 0xff) out.write(0x00) // stuff FF → FF 00
    }
    def writeBits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        n += 1
        if (n == 8) { emit(acc & 0xff); acc = 0; n = 0 }
        i -= 1
      }
    }
    /** 1-pad the final partial byte (T.81 F.1.2.3). */
    def finish(): Array[Byte] = {
      if (n > 0) { emit(((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xff); n = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= bytes.length) throw new java.io.EOFException("entropy")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) throw new java.io.EOFException("stuff")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1
          else throw new java.io.IOException(s"marker $m in entropy data")
        }
        acc = b
        n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def readBits(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align (discarding the 1-padding of the current partial
      * byte) and consume the expected RSTm marker (T.81 F.2.2.5 —
      * the marker number must cycle 0..7 in order). */
    def syncRestart(m: Int): Unit = {
      n = 0
      if (pos + 1 >= bytes.length)
        throw new java.io.EOFException("restart marker")
      if ((bytes(pos) & 0xff) != 0xff ||
          (bytes(pos + 1) & 0xff) != (0xd0 + (m % 8)))
        throw new java.io.IOException("missing/misnumbered RST marker")
      pos += 2
    }
  }

  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val byKey: Map[(Int, Int), Int] =
      canonicalCodes(bits, vals).map { case (v, c, l) => (l, c) -> v }.toMap
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.readBit()
        len += 1
        byKey.get((len, code)) match {
          case Some(v) => return v
          case None =>
        }
      }
      throw new java.io.IOException("invalid Huffman code")
    }
  }

  // ---------------------------------------------------------------
  // encoder (synthesis)
  // ---------------------------------------------------------------

  /** Closed-form synthetic geometry/DC rules — small multiples of the
    * 8×8 block so every block is full (the decoder still crops
    * partial blocks generally). */
  def widthOf(docId: Long): Int = 8 * (1 + (docId % 3)).toInt
  def heightOf(docId: Long): Int = 8 * (1 + (docId % 2)).toInt
  def dcOf(docId: Long, b: Int): Int = (((docId + 7L * b) % 9) - 4).toInt

  /** DC-only coefficient blocks (zigzag order) for the oracle corpus. */
  private def oracleBlocks(docId: Long): Array[Array[Int]] = {
    val nb = (widthOf(docId) / 8) * (heightOf(docId) / 8)
    Array.tabulate(nb) { b =>
      val z = new Array[Int](64)
      z(0) = dcOf(docId, b)
      z
    }
  }

  def encode(docId: Long): Array[Byte] =
    encodeBlocks(widthOf(docId), heightOf(docId), oracleBlocks(docId))

  /** Per-channel DC rules for the COLOR oracle corpus (distinct linear
    * forms per channel so a plane swap in the decoder cannot cancel
    * out in the means). */
  def dcCbOf(docId: Long, b: Int): Int = (((docId * 3 + 5L * b) % 9) - 4).toInt
  def dcCrOf(docId: Long, b: Int): Int = (((docId * 5 + 11L * b) % 9) - 4).toInt

  private def dcOnlyBlocks(nb: Int, dc: Int => Int): Array[Array[Int]] =
    Array.tabulate(nb) { b =>
      val z = new Array[Int](64)
      z(0) = dc(b)
      z
    }

  def encodeColor(docId: Long): Array[Byte] = {
    val nb = (widthOf(docId) / 8) * (heightOf(docId) / 8)
    encodeBlocksMulti(widthOf(docId), heightOf(docId), Array(
      dcOnlyBlocks(nb, dcOf(docId, _)),
      dcOnlyBlocks(nb, dcCbOf(docId, _)),
      dcOnlyBlocks(nb, dcCrOf(docId, _))))
  }

  /** Grayscale corpus blob with a DRI of 2 — every blob carries real
    * RSTm markers (up to 6 MCUs → markers RST0..RST2 exercised),
    * byte-aligned entropy segments, and per-segment DC predictor
    * resets. */
  def encodeRestart(docId: Long): Array[Byte] =
    encodeBlocksMulti(widthOf(docId), heightOf(docId),
      Array(oracleBlocks(docId)), restartInterval = 2)

  /** 4:2:0 corpus geometry — multiples of 16 so every MCU is fully
    * visible and the oracle needs no crop/padding terms. */
  def widthOf420(docId: Long): Int = 16 * (1 + (docId % 2)).toInt
  def heightOf420(docId: Long): Int = 16

  /** Baseline color at 4:2:0 (Y 2×2, Cb/Cr 1×1): four luma blocks +
    * one block per chroma component per 16×16 MCU; luma DCs follow
    * [[dcOf]] over the luma block raster, chroma over the (4× smaller)
    * chroma raster. */
  def encodeColor420(docId: Long): Array[Byte] = {
    val w = widthOf420(docId)
    val h = heightOf420(docId)
    val nbY = (w / 8) * (h / 8)
    val nbC = (w / 16) * (h / 16)
    encodeBlocksMulti(w, h, Array(
      dcOnlyBlocks(nbY, dcOf(docId, _)),
      dcOnlyBlocks(nbC, dcCbOf(docId, _)),
      dcOnlyBlocks(nbC, dcCrOf(docId, _))),
      Array(0x22, 0x11, 0x11))
  }

  /** Grayscale encoder over ZIGZAG-order coefficient blocks — the
    * 1-component case of [[encodeBlocksMulti]] (exposed so the AC spec
    * can drive arbitrary small coefficients through the real
    * decoder). */
  private[graft] def encodeBlocks(w: Int, h: Int,
                                  blocks: Array[Array[Int]]): Array[Byte] =
    encodeBlocksMulti(w, h, Array(blocks))

  /** General baseline encoder: 1 component (grayscale) or 3 at 4:4:4
    * or subsampled (`samp` = packed H·V byte per component, default
    * all 1×1; interleaved MCUs emit each component's Hi×Vi blocks in
    * T.81 A.2.3 order, per-component DC prediction). Per-component
    * block arrays are RASTER order over that component's own
    * (possibly subsampled) block grid. Differential DC, run-length AC
    * limited to the symbols [[AcBits]]/[[AcVals]] cover (throws
    * otherwise). Luma takes DQT 0 (Annex K.1); chroma components take
    * DQT 1 ([[QuantChromaNat]]); one Huffman table pair serves every
    * component (legal — the SOS slots say so). */
  private[graft] def encodeBlocksMulti(
      w: Int, h: Int, comps: Array[Array[Array[Int]]],
      samp: Array[Int] = null, restartInterval: Int = 0): Array[Byte] = {
    require(comps.length == 1 || comps.length == 3)
    val nc = comps.length
    val sampling = if (samp == null) Array.fill(nc)(0x11) else samp
    val hS = sampling.map(_ >> 4)
    val vS = sampling.map(_ & 15)
    val hMax = hS.max
    val vMax = vS.max
    val dcEnc = canonicalCodes(DcBits, DcVals)
      .map { case (v, c, l) => v -> (c, l) }.toMap
    val acEnc = canonicalCodes(AcBits, AcVals)
      .map { case (v, c, l) => v -> (c, l) }.toMap
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def seg(marker: Int, payload: Array[Int]): Unit = {
      u8(0xff); u8(marker); u16(payload.length + 2)
      payload.foreach(u8)
    }
    u8(0xff); u8(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: (0 until 64).map(k => QuantNat(ZigZag(k))).toArray)
    if (nc == 3)
      seg(0xdb, 1 +: (0 until 64).map(k => QuantChromaNat(ZigZag(k))).toArray)
    // SOF0: component ids 1..nc, per-component sampling, chroma → DQT 1
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      (0 until nc).flatMap(c =>
        Array(c + 1, sampling(c), if (c == 0) 0 else 1)))
    seg(0xc4, 0x00 +: (DcBits ++ DcVals))
    seg(0xc4, 0x10 +: (AcBits ++ AcVals))
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    seg(0xda, nc +: ((1 to nc).flatMap(c => Array(c, 0x00)) ++
      Array(0, 63, 0)).toArray)
    var bw = new BitWriter
    val pred = new Array[Int](nc)
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    (0 until nc).foreach { c =>
      require(comps(c).length == mcusX * hS(c) * mcusY * vS(c),
        s"component $c: ${comps(c).length} blocks != MCU coverage")
    }
    def emitBlock(z: Array[Int], ci: Int): Unit = {
        val diff = z(0) - pred(ci)
        pred(ci) = z(0)
        val t = category(diff)
        val (dc, dl) = dcEnc(t)
        bw.writeBits(dc, dl)
        if (t > 0)
          bw.writeBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC run-length through zigzag 1..63
        var k = 1
        var run = 0
        var lastNz = 63
        while (lastNz > 0 && z(lastNz) == 0) lastNz -= 1
        while (k <= lastNz) {
          if (z(k) == 0) { run += 1 }
          else {
            if (run > 15) throw new IllegalArgumentException(
              "ZRL not in the compact AC table — keep runs <= 15")
            val s = category(z(k))
            val rs = (run << 4) | s
            val (ac, al) = acEnc.getOrElse(rs,
              throw new IllegalArgumentException(
                f"AC symbol 0x$rs%02x outside the compact table"))
            bw.writeBits(ac, al)
            bw.writeBits(
              if (z(k) < 0) z(k) + (1 << s) - 1 else z(k), s)
            run = 0
          }
          k += 1
        }
        if (lastNz < 63) { val (eob, el) = acEnc(0x00); bw.writeBits(eob, el) }
    }
    var my = 0
    var mcuIdx = 0
    var rstNo = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 &&
            mcuIdx % restartInterval == 0) {
          // close the entropy segment (1-padded), emit RSTm, reset DC
          bw.finish().foreach(b => u8(b & 0xff))
          u8(0xff); u8(0xd0 + (rstNo % 8))
          rstNo += 1
          java.util.Arrays.fill(pred, 0)
          bw = new BitWriter
        }
        mcuIdx += 1
        var ci = 0
        while (ci < nc) {
          var v = 0
          while (v < vS(ci)) {
            var hh = 0
            while (hh < hS(ci)) {
              val cbw = mcusX * hS(ci) // component block-grid width
              emitBlock(comps(ci)((my * vS(ci) + v) * cbw + mx * hS(ci) + hh),
                ci)
              hh += 1
            }
            v += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.finish().foreach(b => u8(b & 0xff))
    u8(0xff); u8(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // decoder
  // ---------------------------------------------------------------

  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Float separable IDCT (T.81 A.3.3) + level shift + clamp over a
    * NATURAL-order dequantized block. */
  private def idct(f: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            sum += cu * cv * f(v * 8 + u) * CosTab(x)(u) * CosTab(y)(v)
            u += 1
          }
          v += 1
        }
        val p = math.rint(sum / 4.0 + 128.0).toInt
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Full decode to a W×H grayscale raster. None on anything the
    * baseline-grayscale profile does not cover or on a corrupt
    * stream. */
  /** General baseline decode to PER-COMPONENT PLANES: 1 component
    * (grayscale) or 3 components at 1×1 sampling (4:4:4 YCbCr, one
    * 8×8 block per component per interleaved MCU, T.81 A.2.3). Each
    * component carries its own quant table, Huffman table pair (from
    * the SOS slots) and DC predictor. Subsampled chroma (4:2:0/4:2:2),
    * progressive, arithmetic, 16-bit DQT and restart markers return
    * None — dropped, never garbage. */
  private[graft] def decodePixels(blob: Array[Byte])
      : Option[(Int, Int, Array[Array[Int]])] = {
    try {
      if (blob.length < 4 || (blob(0) & 0xff) != 0xff ||
          (blob(1) & 0xff) != 0xd8) return None
      var pos = 2
      val quants = new Array[Array[Int]](4) // natural order, by Tq
      val dcTabs = new Array[HuffDecoder](4)
      val acTabs = new Array[HuffDecoder](4)
      var w = 0
      var h = 0
      var ncomp = 0
      val compQ = new Array[Int](3)    // per-component quant table id
      val compSamp = new Array[Int](3) // per-component packed H·V
      var restartInterval = 0          // DRI: MCUs between RSTm, 0 = none
      def u16(p: Int): Int = ((blob(p) & 0xff) << 8) | (blob(p + 1) & 0xff)
      while (pos + 4 <= blob.length) {
        if ((blob(pos) & 0xff) != 0xff) return None
        val marker = blob(pos + 1) & 0xff
        if (marker == 0xd9) return None // EOI before any scan
        val len = u16(pos + 2)
        val body = pos + 4
        marker match {
          case 0xdb => // DQT: 1+ tables, 8-bit precision only
            var p = body
            while (p < pos + 2 + len) {
              val pqtq = blob(p) & 0xff
              if ((pqtq >> 4) != 0) return None // 16-bit table
              val tbl = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tbl(ZigZag(k)) = blob(p + 1 + k) & 0xff; k += 1
              }
              quants(pqtq & 15) = tbl
              p += 65
            }
          case 0xc0 => // SOF0 baseline: 1 or 3 comps, 4:4:4 or 4:2:0
            if ((blob(body) & 0xff) != 8) return None
            h = u16(body + 1)
            w = u16(body + 3)
            ncomp = blob(body + 5) & 0xff
            if (ncomp != 1 && ncomp != 3) return None
            var c = 0
            while (c < ncomp) {
              compSamp(c) = blob(body + 7 + 3 * c) & 0xff
              compQ(c) = blob(body + 8 + 3 * c) & 0xff
              c += 1
            }
            val all111 = (0 until ncomp).forall(compSamp(_) == 0x11)
            val is420 = ncomp == 3 && compSamp(0) == 0x22 &&
              compSamp(1) == 0x11 && compSamp(2) == 0x11
            if (!all111 && !is420) return None // 4:2:2 etc. out of scope
          case 0xdd => // DRI
            restartInterval = u16(body)
          case 0xc4 => // DHT: 1+ tables
            var p = body
            while (p < pos + 2 + len) {
              val tcth = blob(p) & 0xff
              val bits = Array.tabulate(16)(i => blob(p + 1 + i) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(i => blob(p + 17 + i) & 0xff)
              val dec = new HuffDecoder(bits, vals)
              if ((tcth >> 4) == 0) dcTabs(tcth & 15) = dec
              else acTabs(tcth & 15) = dec
              p += 17 + nv
            }
          case 0xda => // SOS → entropy-coded segment
            if (w == 0 || h == 0 || ncomp == 0) return None
            val ns = blob(body) & 0xff
            if (ns != ncomp) return None // single interleaved scan only
            val compDc = new Array[HuffDecoder](ncomp)
            val compAc = new Array[HuffDecoder](ncomp)
            val compQt = new Array[Array[Int]](ncomp)
            var c = 0
            while (c < ncomp) {
              val tdta = blob(body + 2 + 2 * c) & 0xff
              compDc(c) = dcTabs(tdta >> 4)
              compAc(c) = acTabs(tdta & 15)
              compQt(c) = quants(compQ(c))
              if (compDc(c) == null || compAc(c) == null ||
                  compQt(c) == null) return None
              c += 1
            }
            val br = new BitReader(blob, pos + 2 + len)
            val hS = Array.tabulate(ncomp)(compSamp(_) >> 4)
            val vS = Array.tabulate(ncomp)(compSamp(_) & 15)
            val hMax = hS.max
            val vMax = vS.max
            val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            // per-component padded SUBSAMPLED planes (T.81 A.2.3: each
            // MCU carries Hi×Vi blocks of component i)
            val pw = Array.tabulate(ncomp)(c => mcusX * hS(c) * 8)
            val sub = Array.tabulate(ncomp)(c =>
              new Array[Int](pw(c) * mcusY * vS(c) * 8))
            val pred = new Array[Int](ncomp)
            def decodeBlock(ci: Int): Array[Int] = {
              val quant = compQt(ci)
              val coef = new Array[Int](64)
              val t = compDc(ci).decode(br)
              pred(ci) += extend(br.readBits(t), t)
              coef(0) = pred(ci) * quant(0)
              var k = 1
              var open = true
              while (open && k < 64) {
                val rs = compAc(ci).decode(br)
                if (rs == 0x00) open = false // EOB
                else {
                  val r = rs >> 4
                  val s = rs & 15
                  if (s == 0) {
                    if (r == 15) k += 16 // ZRL
                    else throw new java.io.IOException("bad AC symbol")
                  } else {
                    k += r
                    if (k > 63) throw new java.io.IOException("AC overflow")
                    val nat = ZigZag(k)
                    coef(nat) = extend(br.readBits(s), s) * quant(nat)
                    k += 1
                  }
                }
              }
              idct(coef)
            }
            var mcuIdx = 0
            var rstNo = 0
            var byi = 0
            while (byi < mcusY) {
              var bxi = 0
              while (bxi < mcusX) {
                if (restartInterval > 0 && mcuIdx > 0 &&
                    mcuIdx % restartInterval == 0) {
                  br.syncRestart(rstNo)
                  rstNo += 1
                  java.util.Arrays.fill(pred, 0)
                }
                mcuIdx += 1
                var ci = 0
                while (ci < ncomp) {
                  var v = 0
                  while (v < vS(ci)) {
                    var hh = 0
                    while (hh < hS(ci)) {
                      val px = decodeBlock(ci)
                      val img = sub(ci)
                      val row0 = (byi * vS(ci) + v) * 8
                      val col0 = (bxi * hS(ci) + hh) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          img((row0 + yy) * pw(ci) + col0 + xx) =
                            px(yy * 8 + xx)
                          xx += 1
                        }
                        yy += 1
                      }
                      hh += 1
                    }
                    v += 1
                  }
                  ci += 1
                }
                bxi += 1
              }
              byi += 1
            }
            // upsample (sample replication) + crop to full geometry
            val planes = Array.tabulate(ncomp) { ci =>
              val img = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                val sy = y * vS(ci) / vMax
                var x = 0
                while (x < w) {
                  img(y * w + x) = sub(ci)(sy * pw(ci) + x * hS(ci) / hMax)
                  x += 1
                }
                y += 1
              }
              img
            }
            return Some((w, h, planes))
          case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None // progressive/extended/arithmetic — unsupported
          case _ => // APPn, COM, etc.
        }
        pos += 2 + len
      }
      None
    } catch { case _: Exception => None }
  }

  final case class JpegInfo(doc_id: Long, width: Int, height: Int,
                            n_blocks: Long, mean_px: Double)

  private def planeMean(img: Array[Int]): Double = {
    var sum = 0L
    var i = 0
    while (i < img.length) { sum += img(i); i += 1 }
    sum.toDouble / img.length
  }

  def decodeInfo(docId: Long, blob: Array[Byte]): Option[JpegInfo] =
    decodePixels(blob).filter(_._3.length == 1).map { case (w, h, planes) =>
      JpegInfo(docId, w, h,
        ((w + 7) / 8).toLong * ((h + 7) / 8), planeMean(planes(0)))
    }

  final case class JpegColorInfo(doc_id: Long, width: Int, height: Int,
                                 n_blocks: Long, mean_y: Double,
                                 mean_cb: Double, mean_cr: Double)

  def decodeColorInfo(docId: Long, blob: Array[Byte]): Option[JpegColorInfo] =
    decodePixels(blob).filter(_._3.length == 3).map { case (w, h, planes) =>
      JpegColorInfo(docId, w, h,
        ((w + 7) / 8).toLong * ((h + 7) / 8),
        planeMean(planes(0)), planeMean(planes(1)), planeMean(planes(2)))
    }

  def jpegMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encode(id))))
  }

  /** Driver-checked exercise of the REAL decoder: geometry, block
    * count and mean pixel all re-derived closed-form by the oracle
    * (DC-only blocks ⇒ flat 128+2·dc rasters — see the object doc),
    * so a bug anywhere in segment parse → Huffman → differential DC →
    * dequant → IDCT shows as a value mismatch. */
  def mmJpeg(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    jpegMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodeInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_blocks"),
        round(col("mean_px"), 6).as("mean_px"))
  }

  def jpegColorMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodeColor(id))))
  }

  /** COLOR decode through the interleaved-MCU path: 3 components at
    * 4:4:4, per-component quant/predictors, per-plane means — each
    * channel's mean re-derived closed-form by the oracle from its own
    * DC rule (distinct per channel, so a plane swap cannot hide). */
  def mmJpegColor(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    jpegColorMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodeColorInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_blocks"),
        round(col("mean_y"), 6).as("mean_y"),
        round(col("mean_cb"), 6).as("mean_cb"),
        round(col("mean_cr"), 6).as("mean_cr"))
  }

  def jpeg420Media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodeColor420(id))))
  }

  /** COLOR decode at 4:2:0 — the subsampling every camera/phone JPEG
    * actually ships: 16×16 MCUs carrying four luma blocks + one per
    * chroma component, chroma planes decoded at quarter resolution
    * and replication-upsampled. Per-plane means re-derived closed-form
    * from the per-channel DC rules over each component's OWN block
    * grid (luma 4×/MCU, chroma 1×), so a luma/chroma grid mix-up or
    * a skipped subsampled block moves a mean; MCU-interleave order and
    * the upsample kernel are raster-pinned by JpegSpec. */
  def mmJpeg420(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    jpeg420Media(spark, dir)
      .mapPartitions(_.flatMap(m => decodeColorInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_blocks"),
        round(col("mean_y"), 6).as("mean_y"),
        round(col("mean_cb"), 6).as("mean_cb"),
        round(col("mean_cr"), 6).as("mean_cr"))
  }

  def jpegRestartMedia(spark: SparkSession, dir: String)
      : Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodeRestart(id))))
  }

  /** Restart-marker path (DRI + RSTm): the feature that makes
    * real-world JPEGs resynchronizable (and parallel-decodable) —
    * every corpus blob carries a DRI of 2, so the decoder must
    * byte-align at each marker, verify the RST number cycle, and
    * reset the DC predictors. The differential-DC stream is
    * DIFFERENT from the no-restart encoding of the same blocks
    * (predictors reset per segment), yet must decode to the SAME
    * pixels — the mm_jpeg closed form, so a missed predictor reset
    * or a swallowed marker shows as a mean shift or a dropped row. */
  def mmJpegRestart(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    jpegRestartMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodeInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_blocks"),
        round(col("mean_px"), 6).as("mean_px"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_jpeg" -> mmJpeg,
    "mm_jpeg_color" -> mmJpegColor,
    "mm_jpeg_420" -> mmJpeg420,
    "mm_jpeg_rst" -> mmJpegRestart)

  val oracles: Map[String, String] = Map(
    // geometry + per-block DC closed forms; mean over equal-sized
    // flat blocks = mean over blocks of 128 + 2·dc(b)
    "mm_jpeg" ->
      """SELECT doc_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nb AS BIGINT) AS n_blocks,
        |  round((SELECT avg(128 + 2 * (((doc_id + 7*g.i) % 9) - 4))
        |         FROM generate_series(0, 5) g(i) WHERE g.i < nb), 6)
        |    AS mean_px
        |FROM (SELECT doc_id, 8 * (1 + doc_id % 3) AS w,
        |             8 * (1 + doc_id % 2) AS h,
        |             (1 + doc_id % 3) * (1 + doc_id % 2) AS nb
        |      FROM documents)""".stripMargin,
    // the restart path decodes to the SAME pixels as mm_jpeg (resets
    // are encoder+decoder symmetric), so the closed form is identical
    // — what the query proves is that the marker/reset machinery
    // recovers it from a structurally different entropy stream
    "mm_jpeg_rst" ->
      """SELECT doc_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nb AS BIGINT) AS n_blocks,
        |  round((SELECT avg(128 + 2 * (((doc_id + 7*g.i) % 9) - 4))
        |         FROM generate_series(0, 5) g(i) WHERE g.i < nb), 6)
        |    AS mean_px
        |FROM (SELECT doc_id, 8 * (1 + doc_id % 3) AS w,
        |             8 * (1 + doc_id % 2) AS h,
        |             (1 + doc_id % 3) * (1 + doc_id % 2) AS nb
        |      FROM documents)""".stripMargin,
    // per-channel closed forms: flat 128 + 2·dc_ch(b) blocks with each
    // channel's own DC rule (luma (d+7b)%9-4, cb (3d+5b)%9-4,
    // cr (5d+11b)%9-4)
    "mm_jpeg_color" ->
      """SELECT doc_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nb AS BIGINT) AS n_blocks,
        |  round((SELECT avg(128 + 2 * (((doc_id + 7*g.i) % 9) - 4))
        |         FROM generate_series(0, 5) g(i) WHERE g.i < nb), 6)
        |    AS mean_y,
        |  round((SELECT avg(128 + 2 * (((doc_id*3 + 5*g.i) % 9) - 4))
        |         FROM generate_series(0, 5) g(i) WHERE g.i < nb), 6)
        |    AS mean_cb,
        |  round((SELECT avg(128 + 2 * (((doc_id*5 + 11*g.i) % 9) - 4))
        |         FROM generate_series(0, 5) g(i) WHERE g.i < nb), 6)
        |    AS mean_cr
        |FROM (SELECT doc_id, 8 * (1 + doc_id % 3) AS w,
        |             8 * (1 + doc_id % 2) AS h,
        |             (1 + doc_id % 3) * (1 + doc_id % 2) AS nb
        |      FROM documents)""".stripMargin,
    // 4:2:0: luma mean over the LUMA block grid ((w/8)·(h/8) = up to
    // 8 blocks), chroma means over the quarter-size chroma grid
    // (w/16 · h/16 = up to 2 blocks) — replication upsampling of
    // equal-sized flat blocks preserves each grid's block average
    "mm_jpeg_420" ->
      """SELECT doc_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nby AS BIGINT) AS n_blocks,
        |  round((SELECT avg(128 + 2 * (((doc_id + 7*g.i) % 9) - 4))
        |         FROM generate_series(0, 7) g(i) WHERE g.i < nby), 6)
        |    AS mean_y,
        |  round((SELECT avg(128 + 2 * (((doc_id*3 + 5*g.i) % 9) - 4))
        |         FROM generate_series(0, 1) g(i) WHERE g.i < nbc), 6)
        |    AS mean_cb,
        |  round((SELECT avg(128 + 2 * (((doc_id*5 + 11*g.i) % 9) - 4))
        |         FROM generate_series(0, 1) g(i) WHERE g.i < nbc), 6)
        |    AS mean_cr
        |FROM (SELECT doc_id, 16 * (1 + doc_id % 2) AS w, 16 AS h,
        |             (2 * (1 + doc_id % 2)) * 2 AS nby,
        |             1 + doc_id % 2 AS nbc
        |      FROM documents)""".stripMargin)
}
