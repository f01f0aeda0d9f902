package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Multimodal.MediaRow

/** VIDEO modality — codec path #5 next to WAV/BMP/PNG/JPEG: a REAL
  * container walk over uncompressed RIFF/AVI (the video-for-windows
  * layout every tool still writes for raw captures): RIFF size-chunk
  * grammar, `hdrl` LIST with `avih` + one `vids` stream (`strh` +
  * BITMAPINFOHEADER `strf`), `movi` LIST of `00db` device-independent
  * bitmap frames (bottom-up BGR24 with 4-byte stride padding — the
  * BMP pixel layout without the BMP file header), even-byte chunk
  * alignment. Malformed or truncated containers, compressed streams
  * (biCompression != 0), and frame/geometry mismatches return None —
  * dropped, never garbage.
  *
  * Synthesis follows the WAV/BMP rule (Multimodal.scala): the corpus
  * has no video blobs, so deterministic AVIs are built in the same
  * mapPartitions pass from a closed-form per-frame pixel function —
  * every frame-decode output is then exactly replayable in SQL.
  *
  * Scale posture: identical to the other codecs — decode is a
  * mapPartitions projection at scan speed, one parser per task, no
  * shuffle; keyframe selection folds per-video inside the projection
  * (frames of ONE video never span tasks), so at 100 TB the cost
  * rides the scan like every decode. */
object Avi {

  // closed-form synthetic geometry: tiny frames so the oracle's
  // generate_series stays small, several frames so keyframe selection
  // has a real argmax to find
  def widthOf(docId: Long): Int = 2 + (docId % 3).toInt   // 2..4
  def heightOf(docId: Long): Int = 1 + (docId % 2).toInt  // 1..2
  def framesOf(docId: Long): Int = 2 + (docId % 4).toInt  // 2..5
  val Fps = 10

  /** Per-byte pixel function: frame f, stored row fr, row byte j.
    * The f·17 term makes consecutive frames differ by a per-byte
    * amount that varies with (doc, f) — so the inter-frame delta has
    * a genuine per-video argmax for [[mmKeyframes]]. */
  def pixOf(docId: Long, f: Int, fr: Int, j: Int): Int =
    ((docId * 7 + f * 17L + fr * 31L + j * 13L) % 251).toInt

  // ---------------------------------------------------------------
  // encoder (synthesis)
  // ---------------------------------------------------------------

  /** Minimal-but-valid uncompressed AVI: RIFF(AVI )/LIST(hdrl:
    * avih, LIST(strl: strh vids + strf BITMAPINFOHEADER))/LIST(movi:
    * `00db` raw DIB frames). Frame data is bottom-up BGR24 with
    * 4-byte stride padding (the BMP raster rule). */
  def encode(docId: Long): Array[Byte] = {
    val w = widthOf(docId); val h = heightOf(docId); val nf = framesOf(docId)
    val rb = w * 3
    val pad = (4 - rb % 4) % 4
    val stride = rb + pad
    val frameBytes = stride * h
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }          // little-endian
    def u32(v: Int): Unit = { u16(v); u16(v >> 16) }
    def fourcc(s: String): Unit = s.foreach(c => u8(c.toInt))
    def sub(build: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); build(b); b.toByteArray
    }
    def frame(f: Int): Array[Byte] = sub { b =>
      var fr = 0
      while (fr < h) {
        var j = 0
        while (j < rb) { b.write(pixOf(docId, f, fr, j)); j += 1 }
        var p = 0
        while (p < pad) { b.write(0); p += 1 }
        fr += 1
      }
    }
    // inner bodies first (RIFF sizes are exact, so build bottom-up)
    val strf = sub { b =>
      def bu32(v: Int): Unit = { b.write(v); b.write(v >> 8)
        b.write(v >> 16); b.write(v >> 24) }
      def bu16(v: Int): Unit = { b.write(v); b.write(v >> 8) }
      bu32(40); bu32(w); bu32(h)          // biSize, width, height (bottom-up)
      bu16(1); bu16(24); bu32(0)          // planes, bpp, BI_RGB
      bu32(frameBytes); bu32(2835); bu32(2835); bu32(0); bu32(0)
    }
    val strh = sub { b =>
      def bu32(v: Int): Unit = { b.write(v); b.write(v >> 8)
        b.write(v >> 16); b.write(v >> 24) }
      "vids".foreach(c => b.write(c.toInt)); "DIB ".foreach(c => b.write(c.toInt))
      bu32(0); bu32(0); bu32(0)           // flags, prio+lang, initial frames
      bu32(1); bu32(Fps)                  // scale, rate → Fps frames/sec
      bu32(0); bu32(nf)                   // start, length (frames)
      bu32(frameBytes); bu32(0xffffffff); bu32(0) // bufsize, quality, samplesize
      bu32(0); bu32(0)                    // rcFrame (two packed words)
    }
    val avih = sub { b =>
      def bu32(v: Int): Unit = { b.write(v); b.write(v >> 8)
        b.write(v >> 16); b.write(v >> 24) }
      bu32(1000000 / Fps); bu32(frameBytes * Fps); bu32(0); bu32(0x10)
      bu32(nf); bu32(0); bu32(1); bu32(frameBytes)
      bu32(w); bu32(h); bu32(0); bu32(0); bu32(0); bu32(0)
    }
    def list(kind: String, build: java.io.ByteArrayOutputStream => Unit)
        : Array[Byte] = {
      val inner = sub(build)
      sub { b =>
        kind.foreach(c => b.write(c.toInt))
        b.write(inner, 0, inner.length)
      }
    }
    def bchunk(b: java.io.ByteArrayOutputStream, id: String,
               body: Array[Byte]): Unit = {
      id.foreach(c => b.write(c.toInt))
      b.write(body.length); b.write(body.length >> 8)
      b.write(body.length >> 16); b.write(body.length >> 24)
      b.write(body, 0, body.length)
      if (body.length % 2 == 1) b.write(0)
    }
    val strl = list("strl", b => { bchunk(b, "strh", strh); bchunk(b, "strf", strf) })
    val hdrl = list("hdrl", b => { bchunk(b, "avih", avih); bchunk(b, "LIST", strl) })
    val movi = list("movi",
      b => (0 until nf).foreach(f => bchunk(b, "00db", frame(f))))
    val riffBody = sub { b =>
      fourccTo(b, "AVI ")
      bchunk(b, "LIST", hdrl)
      bchunk(b, "LIST", movi)
    }
    fourcc("RIFF"); u32(riffBody.length)
    out.write(riffBody, 0, riffBody.length)
    out.toByteArray
  }

  private def fourccTo(b: java.io.ByteArrayOutputStream, s: String): Unit =
    s.foreach(c => b.write(c.toInt))

  // ---------------------------------------------------------------
  // decoder
  // ---------------------------------------------------------------

  /** Decoded video: geometry + the raw pixel bytes of every frame
    * (pixel bytes only — stride padding stripped, rows in STORED
    * bottom-up order, the BMP raster convention). */
  final case class VideoPixels(width: Int, height: Int,
                               frames: Array[Array[Int]])

  /** Real RIFF walk: validates the grammar, reads geometry from the
    * BITMAPINFOHEADER, collects `00db` frames, rejects compressed
    * streams / bad sizes / truncations. */
  private[graft] def decodePixels(b: Array[Byte]): Option[VideoPixels] = {
    try {
      def u32(p: Int): Int =
        (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
          ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
      def cc(p: Int): String =
        new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)), "US-ASCII")
      if (b.length < 24 || cc(0) != "RIFF") return None
      val riffLen = u32(4)
      if (riffLen < 4 || 8L + riffLen > b.length) return None
      if (cc(8) != "AVI ") return None
      var w = 0; var h = 0; var stride = 0
      val frames = Array.newBuilder[Array[Int]]
      // walk a chunk sequence in [from, to); recurse into LISTs
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = cc(p)
          val len = u32(p + 4)
          val body = p + 8
          if (len < 0 || body + len > to)
            throw new java.io.IOException("chunk overruns parent")
          id match {
            case "LIST" =>
              if (len < 4) throw new java.io.IOException("short LIST")
              walk(body + 4, body + len) // skip the list-kind fourcc
            case "strf" =>
              if (len < 40) throw new java.io.IOException("short strf")
              if (u32(body + 16) != 0)
                throw new java.io.IOException("compressed stream")
              if ((u32(body + 12) & 0xffff0000) != 0x18 << 16)
                throw new java.io.IOException("not 24bpp")
              w = u32(body + 4); h = u32(body + 8)
              if (w <= 0 || w > (1 << 16) || h <= 0 || h > (1 << 16))
                throw new java.io.IOException("bad geometry")
              stride = ((w * 3 + 3) / 4) * 4
            case "00db" =>
              if (w == 0) throw new java.io.IOException("frame before strf")
              if (len != stride * h)
                throw new java.io.IOException("frame size mismatch")
              val px = new Array[Int](w * 3 * h)
              var fr = 0
              while (fr < h) {
                var j = 0
                while (j < w * 3) {
                  px(fr * w * 3 + j) = b(body + fr * stride + j) & 0xff
                  j += 1
                }
                fr += 1
              }
              frames += px
            case _ => // avih, strh, idx1, JUNK …
          }
          p = body + len + (len & 1) // even alignment
        }
      }
      walk(12, 8 + riffLen)
      val fs = frames.result()
      if (w == 0 || fs.isEmpty) None else Some(VideoPixels(w, h, fs))
    } catch { case _: Exception => None }
  }

  final case class VideoInfo(doc_id: Long, width: Int, height: Int,
                             n_frames: Long, mean_b: Double, mean_g: Double,
                             mean_r: Double)

  def decodeInfo(docId: Long, blob: Array[Byte]): Option[VideoInfo] =
    decodePixels(blob).map { vp =>
      val sums = new Array[Long](3)
      vp.frames.foreach { px =>
        var i = 0
        while (i < px.length) { sums(i % 3) += px(i); i += 1 }
      }
      val n = vp.width.toLong * vp.height * vp.frames.length
      VideoInfo(docId, vp.width, vp.height, vp.frames.length.toLong,
        sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
    }

  final case class Keyframe(doc_id: Long, n_frames: Long, key_frame: Long,
                            max_delta: Long)

  /** SCENE-CHANGE keyframe: the frame whose summed absolute per-byte
    * delta against its predecessor is LARGEST (ties → earliest frame)
    * — integer-exact, so the oracle replays the argmax to the byte.
    * The fold runs inside the decode projection: frames of one video
    * never leave the task. */
  def decodeKeyframe(docId: Long, blob: Array[Byte]): Option[Keyframe] =
    decodePixels(blob).filter(_.frames.length >= 2).map { vp =>
      var best = 1; var bestDelta = -1L
      var f = 1
      while (f < vp.frames.length) {
        val a = vp.frames(f - 1); val c = vp.frames(f)
        var d = 0L
        var i = 0
        while (i < c.length) { d += math.abs(c(i) - a(i)); i += 1 }
        if (d > bestDelta) { bestDelta = d; best = f }
        f += 1
      }
      Keyframe(docId, vp.frames.length.toLong, best.toLong, bestDelta)
    }

  def aviMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encode(id))))
  }

  /** Driver-checked exercise of the REAL container walk: geometry,
    * frame count and per-channel means over ALL frames re-derived
    * closed-form by the oracle. */
  def mmVideo(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    aviMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodeInfo(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames"),
        round(col("mean_b"), 6).as("mean_b"),
        round(col("mean_g"), 6).as("mean_g"),
        round(col("mean_r"), 6).as("mean_r"))
  }

  /** Keyframe selection over the whole corpus — frame-sample step #2
    * (after the stride sample `mm_frames`): pick the scene-change
    * frame per video, integer-exact argmax. */
  def mmKeyframes(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    aviMedia(spark, dir)
      .mapPartitions(_.flatMap(m => decodeKeyframe(m.doc_id, m.blob)))
      .toDF()
      .select(col("doc_id"), col("n_frames"), col("key_frame"),
        col("max_delta"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_video" -> mmVideo,
    "mm_keyframes" -> mmKeyframes)

  val oracles: Map[String, String] = Map(
    // per-channel means over frames×rows×row-bytes of the closed-form
    // pixel fn: channel = j % 3 (BGR within each pixel triple)
    "mm_video" ->
      """WITH g AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS w, 1 + doc_id % 2 AS h,
        |         2 + doc_id % 4 AS nf
        |  FROM documents
        |), px AS (
        |  SELECT g.doc_id, g.w, g.h, g.nf, (j.j % (g.w*3)) % 3 AS ch,
        |         (g.doc_id*7 + f.f*17 + (j.j // (g.w*3))*31
        |          + (j.j % (g.w*3))*13) % 251 AS v
        |  FROM g
        |  JOIN (SELECT unnest(generate_series(0, 4)) AS f) f ON f.f < g.nf
        |  JOIN (SELECT unnest(generate_series(0, 23)) AS j) j
        |    ON j.j < g.w * 3 * g.h
        |)
        |SELECT doc_id,
        |  CAST(max(w) AS BIGINT) AS width,
        |  CAST(max(h) AS BIGINT) AS height,
        |  CAST(max(nf) AS BIGINT) AS n_frames,
        |  round(sum(CASE WHEN ch = 0 THEN v END)
        |        / (max(w) * max(h) * max(nf) * 1.0), 6) AS mean_b,
        |  round(sum(CASE WHEN ch = 1 THEN v END)
        |        / (max(w) * max(h) * max(nf) * 1.0), 6) AS mean_g,
        |  round(sum(CASE WHEN ch = 2 THEN v END)
        |        / (max(w) * max(h) * max(nf) * 1.0), 6) AS mean_r
        |FROM px GROUP BY doc_id""".stripMargin,
    // per-frame-pair summed |delta| replayed byte-for-byte; argmax by
    // (delta DESC, frame ASC) — the decoder's exact tie-break
    "mm_keyframes" ->
      """WITH g AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS w, 1 + doc_id % 2 AS h,
        |         2 + doc_id % 4 AS nf
        |  FROM documents
        |), d AS (
        |  SELECT g.doc_id, g.nf, f.f,
        |         sum(abs(
        |           (g.doc_id*7 + f.f*17 + (j.j // (g.w*3))*31
        |            + (j.j % (g.w*3))*13) % 251
        |         - (g.doc_id*7 + (f.f-1)*17 + (j.j // (g.w*3))*31
        |            + (j.j % (g.w*3))*13) % 251)) AS delta
        |  FROM g
        |  JOIN (SELECT unnest(generate_series(1, 4)) AS f) f ON f.f < g.nf
        |  JOIN (SELECT unnest(generate_series(0, 23)) AS j) j
        |    ON j.j < g.w * 3 * g.h
        |  GROUP BY g.doc_id, g.nf, f.f
        |)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(f AS BIGINT) AS key_frame,
        |       CAST(delta AS BIGINT) AS max_delta
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY delta DESC, f) AS rn FROM d)
        |WHERE rn = 1""".stripMargin)
}
