package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Multimodal.MediaRow

/** GIF87a/89a decode — codec path #6 next to WAV/BMP/PNG/JPEG/AVI:
  * the one classic image container still missing, and the only one
  * whose compression is LZW (a genuinely different decompressor from
  * PNG's DEFLATE and JPEG's Huffman). The decoder is REAL and general
  * for non-interlaced images: header + logical-screen-descriptor
  * parse, global/local color tables, 89a extension blocks, sub-block
  * defragmentation, and a full variable-code-width LZW decompressor —
  * LSB-first bit order, clear/EOI codes, dictionary growth to 12 bits
  * with the GIF (non-early-change) width-bump rule, the KwKwK case,
  * and table-full behavior (no further adds until a clear code) —
  * plus four-pass interlace de-scheduling. Corrupt/truncated streams
  * return None — they drop from the relation instead of poisoning
  * it.
  *
  * Synthesis follows the PngEncoder pattern (Multimodal.scala): the
  * corpus has no image blobs, so deterministic GIFs are built in the
  * same mapPartitions pass by a REAL LZW compressor (dictionary,
  * variable width, clear-on-full) — not a "literal codes only" fake —
  * so the decoder's growth path is exercised by every blob. Pixels
  * are 8-bit palette indices from the shared closed form
  * idx = (doc_id·7 + r·31 + j·13) mod 251, which the DuckDB oracle
  * replays exactly (geometry, pixel count, integer index sum).
  *
  * Scale posture: identical to the other codecs — decode is a
  * mapPartitions projection at scan speed, no shuffle; at 100 TB the
  * codec cost rides the scan.
  *
  * Reference scope note: the reference engine (KMeans.java) has no
  * media path at all; this is extension surface mandated by the
  * builder brief's multimodal requirement. */
object Gif {

  def widthOf(docId: Long): Int = (4 + docId % 9).toInt
  def heightOf(docId: Long): Int = (3 + docId % 6).toInt
  /** Palette index of pixel (r, j) — non-negative by construction. */
  def pixelOf(docId: Long, r: Int, j: Int): Int =
    ((docId * 7 + r * 31L + j * 13L) % 251).toInt

  private val Clear = 256
  private val Eoi = 257
  private val MaxCode = 4096

  // -------------------------------------------------------------------
  // Encoder (synthesis only): real LZW with dictionary + width growth
  // -------------------------------------------------------------------

  /** LSB-first variable-width bit packer (the GIF bit order). */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
  }

  /** Real GIF LZW compression of an 8-bit index stream (min code size
    * 8): dictionary of (prefix code, byte) pairs, codes start at 9
    * bits and grow when the next emittable code would not fit,
    * clear-and-reset when the table hits 4096. */
  private[graft] def lzwCompress(pixels: Array[Int]): Array[Byte] = {
    val bw = new BitWriter
    var width = 9
    var next = Eoi + 1
    var table = new java.util.HashMap[Long, Integer]()
    def key(prefix: Int, k: Int): Long = prefix.toLong << 8 | k
    bw.write(Clear, width)
    var prefix = -1
    var i = 0
    while (i < pixels.length) {
      val k = pixels(i)
      if (prefix < 0) prefix = k
      else {
        val code = table.get(key(prefix, k))
        if (code != null) prefix = code.intValue()
        else {
          bw.write(prefix, width)
          if (next == MaxCode) {
            bw.write(Clear, width)
            table = new java.util.HashMap[Long, Integer]()
            next = Eoi + 1
            width = 9
          } else {
            table.put(key(prefix, k), next)
            next += 1
            if (next > (1 << width) && width < 12) width += 1
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) {
      bw.write(prefix, width)
      // the decoder performs one more dictionary add after this code;
      // mirror its width bump so EOI is written at the width it will
      // be read with (matters only when the add lands exactly on a
      // power-of-two boundary)
      if (next < MaxCode) {
        next += 1
        if (next > (1 << width) && width < 12) width += 1
      }
    }
    bw.write(Eoi, width)
    bw.finish()
  }

  /** GIF interlace row schedule: the four passes (every 8th row from
    * 0, every 8th from 4, every 4th from 2, every 2nd from 1) — the
    * array maps STORED row index → display row. */
  private[graft] def interlaceRows(h: Int): Array[Int] =
    ((0 until h by 8) ++ (4 until h by 8) ++
      (2 until h by 4) ++ (1 until h by 2)).toArray

  /** Full GIF blob: logical screen + 256-entry global color table
    * (entry i = (i, 2i mod 256, 7i mod 256)), one or more frames at
    * the origin (multi-frame blobs are GIF89a with a graphic-control
    * extension per frame, the animated shape; `interlaced` stores
    * frame rows in the four-pass schedule), real-LZW image data in
    * ≤255-byte sub-blocks, trailer. */
  private[graft] def encodeFrames(w: Int, h: Int,
                                  frames: Seq[(Int, Int) => Int],
                                  interlaced: Boolean = false)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) } // little-endian
    val animated = frames.size > 1
    out.write((if (animated) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    u16(w); u16(h)
    u8(0xF7) // GCT present, 8-bit color resolution, 256 entries
    u8(0); u8(0) // background index, aspect
    var i = 0
    while (i < 256) { u8(i); u8((2 * i) & 0xff); u8((7 * i) & 0xff); i += 1 }
    frames.foreach { px =>
      if (animated) { // graphic control extension, 10ms delay
        u8(0x21); u8(0xF9); u8(0x04); u8(0x00); u16(1); u8(0x00); u8(0x00)
      }
      u8(0x2C) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      u8(if (interlaced) 0x40 else 0x00) // no LCT; interlace flag
      u8(8)    // LZW min code size
      val rowAt: Int => Int =
        if (interlaced) { val ord = interlaceRows(h); ord(_) }
        else identity[Int]
      val pixels = new Array[Int](w * h)
      var r = 0
      while (r < h) {
        val dr = rowAt(r) // display row stored at position r
        var j = 0
        while (j < w) { pixels(r * w + j) = px(dr, j); j += 1 }
        r += 1
      }
      val lzw = lzwCompress(pixels)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        u8(n)
        out.write(lzw, off, n)
        off += n
      }
      u8(0x00) // block terminator
    }
    u8(0x3B) // trailer
    out.toByteArray
  }

  private[graft] def encodeWith(w: Int, h: Int,
                                px: (Int, Int) => Int): Array[Byte] =
    encodeFrames(w, h, Seq(px))

  def encode(docId: Long): Array[Byte] =
    encodeWith(widthOf(docId), heightOf(docId),
      (r, j) => pixelOf(docId, r, j))

  def framesOf(docId: Long): Int = (1 + docId % 3).toInt
  /** Frame f's pixel — frame 0 is [[pixelOf]]. */
  def framePixelOf(docId: Long, f: Int, r: Int, j: Int): Int =
    ((docId * 7 + r * 31L + j * 13L + f * 17L) % 251).toInt

  /** Animated corpus blob: [[framesOf]] frames over the same logical
    * screen, frame f's raster shifted by the f·17 term. */
  def encodeAnimated(docId: Long): Array[Byte] =
    encodeFrames(widthOf(docId), heightOf(docId),
      (0 until framesOf(docId)).map(f =>
        (r: Int, j: Int) => framePixelOf(docId, f, r, j)))

  /** Interlaced corpus blob: same raster as [[encode]], rows stored
    * in the four-pass schedule. */
  def encodeInterlaced(docId: Long): Array[Byte] =
    encodeFrames(widthOf(docId), heightOf(docId),
      Seq((r, j) => pixelOf(docId, r, j)), interlaced = true)

  // -------------------------------------------------------------------
  // Decoder: the real thing
  // -------------------------------------------------------------------

  private final class Corrupt extends RuntimeException

  /** LSB-first bit reader over the defragmented LZW stream. */
  private final class BitReader(b: Array[Byte]) {
    private var acc = 0L
    private var nBits = 0
    private var pos = 0
    def read(width: Int): Int = {
      while (nBits < width) {
        if (pos >= b.length) throw new Corrupt
        acc |= (b(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      v
    }
  }

  /** Decode EVERY image of a GIF blob to its palette-index raster —
    * multi-frame (animated 89a) blobs yield one raster per frame,
    * each with its own fresh LZW state; interlaced frames come back
    * in display order. None on anything malformed: bad magic,
    * truncation at any layer (including a missing trailer), LZW code
    * out of range, or a pixel count that does not match the frame
    * geometry. */
  private[graft] def decodeFrames(blob: Array[Byte])
      : Option[Vector[(Int, Int, Array[Int])]] =
    try {
      var p = 0
      def u8(): Int = {
        if (p >= blob.length) throw new Corrupt
        val v = blob(p) & 0xff; p += 1; v
      }
      def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
      def skip(n: Int): Unit = {
        if (p + n > blob.length) throw new Corrupt
        p += n
      }
      if (blob.length < 13) return None
      val magic = new String(blob, 0, 6, "US-ASCII")
      if (magic != "GIF87a" && magic != "GIF89a") return None
      p = 6
      u16(); u16() // logical screen w/h (image descriptors carry their own)
      val flags = u8()
      u8(); u8() // background, aspect
      if ((flags & 0x80) != 0) skip(3 * (1 << ((flags & 7) + 1)))
      var frames = Vector.empty[(Int, Int, Array[Int])]
      while (true) {
        u8() match {
          case 0x3B => // trailer
            return if (frames.isEmpty) None else Some(frames)
          case 0x21 => // extension: label + sub-blocks
            u8()
            var n = u8()
            while (n != 0) { skip(n); n = u8() }
          case 0x2C =>
            u16(); u16() // left, top
            val iw = u16(); val ih = u16()
            val iflags = u8()
            val interlaced = (iflags & 0x40) != 0
            if ((iflags & 0x80) != 0) skip(3 * (1 << ((iflags & 7) + 1)))
            val minCode = u8()
            if (minCode != 8) return None // 8-bit images only (our scope)
            if (iw <= 0 || ih <= 0) return None
            // cap TOTAL pixels BEFORE allocating — deliberately
            // stricter than the PNG decoder's per-dimension 2^20 rule
            // (vacuous here: GIF dims are u16, ≤65535 each) because a
            // GIF materializes a full Int raster PER FRAME: a crafted
            // 65535x65535 header would otherwise overflow iw*ih to a
            // negative array size or demand a multi-GB allocation —
            // both escape the Corrupt catch and poison the stream
            // instead of mapping to None. 2^24 (16 MP) admits any
            // plausible real-world GIF while bounding one frame's
            // raster at 64 MB
            if (iw.toLong * ih > (1L << 24)) return None
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) {
              if (p + n > blob.length) throw new Corrupt
              data.write(blob, p, n)
              p += n
              n = u8()
            }
            lzwDecompress(data.toByteArray, iw * ih) match {
              case Some(px) =>
                val raster =
                  if (!interlaced) px
                  else { // undo the four-pass row schedule
                    val ord = interlaceRows(ih)
                    val out = new Array[Int](iw * ih)
                    var r = 0
                    while (r < ih) {
                      System.arraycopy(px, r * iw, out, ord(r) * iw, iw)
                      r += 1
                    }
                    out
                  }
                frames :+= ((iw, ih, raster))
              case None => return None
            }
          case _ => return None
        }
      }
      None
    } catch { case _: Corrupt => None }

  /** First frame of [[decodeFrames]] — the still-image view. */
  private[graft] def decodePixels(blob: Array[Byte])
      : Option[(Int, Int, Array[Int])] =
    decodeFrames(blob).flatMap(_.headOption)

  /** GIF LZW decompression to exactly nPixels indices. Mirrors the
    * compressor: width bump when the table size reaches the code
    * space (non-early-change), KwKwK, clear resets, no adds once the
    * table is full. */
  private def lzwDecompress(data: Array[Byte], nPixels: Int)
      : Option[Array[Int]] =
    try {
      val br = new BitReader(data)
      val prefix = new Array[Int](MaxCode)
      val suffix = new Array[Int](MaxCode)
      val out = new Array[Int](nPixels)
      var outLen = 0
      var width = 9
      var next = Eoi + 1
      var prev = -1
      def emit(code: Int): Int = { // writes string(code), returns first byte
        var stack = List.empty[Int]
        var c = code
        while (c >= Clear) { stack = suffix(c) :: stack; c = prefix(c) }
        val first = c
        stack = c :: stack
        stack.foreach { v =>
          if (outLen >= nPixels) throw new Corrupt // too many pixels
          out(outLen) = v; outLen += 1
        }
        first
      }
      var done = false
      while (!done) {
        val c = br.read(width)
        if (c == Clear) {
          width = 9; next = Eoi + 1; prev = -1
        } else if (c == Eoi) {
          done = true
        } else if (prev < 0) {
          if (c >= Clear) throw new Corrupt // first code must be a literal
          emit(c)
          prev = c
        } else {
          if (c > next || (c == next && next == MaxCode)) throw new Corrupt
          val firstOfPrev = {
            var x = prev
            while (x >= Clear) x = prefix(x)
            x
          }
          val first =
            if (c == next) { // KwKwK: string(prev) + first(string(prev))
              val f = emit(prev)
              if (outLen >= nPixels) throw new Corrupt
              out(outLen) = firstOfPrev; outLen += 1
              f
            } else emit(c)
          if (next < MaxCode) {
            prefix(next) = prev
            suffix(next) = first
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prev = c
        }
      }
      if (outLen != nPixels) None else Some(out)
    } catch { case _: Corrupt => None }

  // -------------------------------------------------------------------
  // Query surface
  // -------------------------------------------------------------------

  final case class GifInfo(doc_id: Long, width: Long, height: Long,
                           n_pixels: Long, sum_px: Long, mean_px: Double)

  def decodeInfo(docId: Long, blob: Array[Byte]): Option[GifInfo] =
    decodePixels(blob).map { case (w, h, px) =>
      var s = 0L
      var i = 0
      while (i < px.length) { s += px(i); i += 1 }
      GifInfo(docId, w.toLong, h.toLong, px.length.toLong, s,
        s.toDouble / px.length)
    }

  def gifMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encode(id))))
  }

  /** Driver-gated exercise of the REAL decoder: every field is
    * oracle-checked — geometry from the doc_id closed forms, the
    * integer index sum re-derived from the pixel arithmetic — so a
    * bug anywhere in the LZW round-trip (bit order, width growth,
    * KwKwK, sub-block seams) surfaces as a value mismatch. */
  def mmGif(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    gifMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodeInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        col("sum_px"), round(col("mean_px"), 6).as("mean_px"))
  }

  final case class GifAnimInfo(doc_id: Long, n_frames: Long, width: Long,
                               height: Long, sum_px: Long, mean_px: Double)

  def decodeAnimInfo(docId: Long, blob: Array[Byte]): Option[GifAnimInfo] =
    decodeFrames(blob).map { frames =>
      val (w, h, _) = frames.head
      var s = 0L; var n = 0L
      frames.foreach { case (_, _, px) =>
        var i = 0
        while (i < px.length) { s += px(i); i += 1 }
        n += px.length
      }
      GifAnimInfo(docId, frames.size.toLong, w.toLong, h.toLong, s,
        s.toDouble / n)
    }

  def gifAnimMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodeAnimated(id))))
  }

  /** The animated path: multi-frame 89a blobs (per-frame
    * graphic-control extensions, per-frame LZW streams) decoded
    * frame-by-frame; frame count, geometry, and the all-frame integer
    * index sum are oracle-replayed, so a dropped frame, a stale LZW
    * table crossing a frame boundary, or a mis-skipped extension all
    * surface as value mismatches. */
  def mmGifFrames(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    gifAnimMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodeAnimInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
        col("sum_px"), round(col("mean_px"), 6).as("mean_px"))
  }

  final case class GifPosInfo(doc_id: Long, width: Long, height: Long,
                              wsum_px: Long)

  /** Position-WEIGHTED checksum Σ (r·w + j)·px(r,j) — the witness for
    * the interlace path: a plain pixel sum is permutation-invariant,
    * so a wrong row schedule would slip through it; the weighted sum
    * moves if any row lands on the wrong display line. */
  def decodePosInfo(docId: Long, blob: Array[Byte]): Option[GifPosInfo] =
    decodePixels(blob).map { case (w, h, px) =>
      var s = 0L
      var i = 0
      while (i < px.length) { s += i.toLong * px(i); i += 1 }
      GifPosInfo(docId, w.toLong, h.toLong, s)
    }

  def gifInterlacedMedia(spark: SparkSession, dir: String)
      : Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodeInterlaced(id))))
  }

  /** The interlaced path: blobs store rows in the four-pass schedule;
    * the decoder must undo it, and the position-weighted oracle
    * witness is computed over DISPLAY order — any de-interlacing slip
    * is a value mismatch, not a silent reshuffle. */
  def mmGifInterlaced(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    gifInterlacedMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodePosInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("wsum_px"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_gif" -> mmGif,
    "mm_gif_frames" -> mmGifFrames,
    "mm_gif_interlaced" -> mmGifInterlaced)

  val oracles: Map[String, String] = Map(
    // geometry + integer pixel-index sum replayed from the synthesis
    // closed forms; mean as the rounded quotient. The decode path is
    // what's under test — the oracle recomputes what the pixels MUST
    // be, the engine recovers them through the real LZW stream.
    "mm_gif" ->
      """WITH p AS (
        |  SELECT doc_id, 4 + doc_id % 9 AS w, 3 + doc_id % 6 AS h
        |  FROM documents
        |), s AS (
        |  SELECT p.doc_id, p.w, p.h,
        |    sum((p.doc_id*7 + r.r*31 + j.j*13) % 251) AS sum_px
        |  FROM p
        |  JOIN (SELECT unnest(generate_series(0, 8)) AS r) r ON r.r < p.h
        |  JOIN (SELECT unnest(generate_series(0, 12)) AS j) j ON j.j < p.w
        |  GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(sum_px AS BIGINT) AS sum_px,
        |  round(sum_px / (w * h * 1.0), 6) AS mean_px
        |FROM s""".stripMargin,
    // the animated replay adds the frame dimension: sum over
    // f ∈ [0, 1 + doc_id%3) of the frame-shifted pixel closed form
    "mm_gif_frames" ->
      """WITH p AS (
        |  SELECT doc_id, 4 + doc_id % 9 AS w, 3 + doc_id % 6 AS h,
        |         1 + doc_id % 3 AS nf
        |  FROM documents
        |), s AS (
        |  SELECT p.doc_id, p.w, p.h, p.nf,
        |    sum((p.doc_id*7 + r.r*31 + j.j*13 + f.f*17) % 251) AS sum_px
        |  FROM p
        |  JOIN (SELECT unnest(generate_series(0, 2)) AS f) f ON f.f < p.nf
        |  JOIN (SELECT unnest(generate_series(0, 8)) AS r) r ON r.r < p.h
        |  JOIN (SELECT unnest(generate_series(0, 12)) AS j) j ON j.j < p.w
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum_px AS BIGINT) AS sum_px,
        |  round(sum_px / (w * h * nf * 1.0), 6) AS mean_px
        |FROM s""".stripMargin,
    // display-order weighted checksum: Σ (r·w + j)·px — replays the
    // de-interlaced raster positionally, so a row landing on the
    // wrong display line cannot cancel
    "mm_gif_interlaced" ->
      """WITH p AS (
        |  SELECT doc_id, 4 + doc_id % 9 AS w, 3 + doc_id % 6 AS h
        |  FROM documents
        |), s AS (
        |  SELECT p.doc_id, p.w, p.h,
        |    sum((r.r * p.w + j.j) *
        |        ((p.doc_id*7 + r.r*31 + j.j*13) % 251)) AS wsum_px
        |  FROM p
        |  JOIN (SELECT unnest(generate_series(0, 8)) AS r) r ON r.r < p.h
        |  JOIN (SELECT unnest(generate_series(0, 12)) AS j) j ON j.j < p.w
        |  GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(wsum_px AS BIGINT) AS wsum_px
        |FROM s""".stripMargin)
}
