package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Multimodal.MediaRow

/** WARC (ISO 28500) — the container web crawls actually ship in
  * (Common Crawl, Internet Archive): a sequence of records, each a
  * `WARC/1.x` version line, CRLF-terminated named headers, a blank
  * line, a content block of exactly `Content-Length` bytes, and a
  * CRLF CRLF record separator. The reader here is real and general
  * for that grammar: case-insensitive header names, unknown headers
  * carried, non-`response` records (warcinfo, request, metadata)
  * skipped but cursor-advanced — the tar typeflag rule — and None on
  * ANY malformation (bad version line, missing/negative
  * Content-Length, truncated content, missing separators) so a
  * corrupt crawl file drops whole instead of emitting a partial
  * record list.
  *
  * The synthetic corpus carries the SAME member payloads as the tar/
  * zip/tar.gz containers ([[Archives.memberLenOf]]/
  * [[Archives.memberByteOf]], one leading warcinfo record ahead of
  * the response records), so `mm_warc` shares the tar oracle SQL
  * verbatim — four wire formats now triangulate one reader relation.
  *
  * Scale posture: identical to the container family — decode is a
  * mapPartitions projection over a 1-column scan, no shuffle; a
  * 100 TB crawl of WARC files streams response rows out at scan
  * speed. (Real crawls gzip each record; the gzip layer is already
  * proven by the .tar.gz composition — [[Archives.gunzip]] — and
  * composes the same way here.) */
object Warc {

  /** Fixed WARC-Date for the synthetic corpus — determinism, not a
    * clock. */
  val SynthDate = "2026-01-01T00:00:00Z"

  final case class WarcRecord(warc_type: String, target_uri: String,
                              size: Long, payload_sum: Long)

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** One WARC record: version line, headers, blank line, content,
    * record separator. */
  private def writeRecord(out: java.io.ByteArrayOutputStream,
                          headers: Seq[(String, String)],
                          content: Array[Byte]): Unit = {
    def line(s: String): Unit = {
      out.write(s.getBytes("US-ASCII")); out.write(Crlf)
    }
    line("WARC/1.0")
    headers.foreach { case (k, v) => line(s"$k: $v") }
    line(s"Content-Length: ${content.length}")
    out.write(Crlf)
    out.write(content)
    out.write(Crlf); out.write(Crlf)
  }

  /** General WARC writer over (uri, payload) responses, with the
    * leading warcinfo record real crawl files carry. */
  def buildWarc(docId: Long,
                responses: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeRecord(out, Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:doc$docId:info>",
      "WARC-Date" -> SynthDate),
      s"software: graft-synth\r\n".getBytes("US-ASCII"))
    responses.zipWithIndex.foreach { case ((uri, data), i) =>
      writeRecord(out, Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:doc$docId:$i>",
        "WARC-Date" -> SynthDate,
        "WARC-Target-URI" -> uri),
        data)
    }
    out.toByteArray
  }

  /** One WARC file per document over the SHARED container members —
    * [[Archives.membersOf]] responses with the tar corpus's
    * deterministic lengths and payload bytes. */
  def encodeWarc(docId: Long): Array[Byte] =
    buildWarc(docId, (0 until Archives.membersOf(docId)).map { i =>
      val len = Archives.memberLenOf(docId, i)
      (s"http://synth.graft/doc$docId/part$i",
        Array.tabulate(len)(j => Archives.memberByteOf(docId, i, j).toByte))
    })

  /** Walk a WARC file: per record, version line (`WARC/1.x`),
    * CRLF-terminated headers to the blank line (case-insensitive
    * names), a content block of exactly Content-Length bytes, then
    * the CRLF CRLF separator; records until exact EOF. None on any
    * malformation. `response` records yield rows; other types are
    * validated and skipped — their bytes still advance the cursor. */
  def decodeWarc(blob: Array[Byte]): Option[Vector[WarcRecord]] = {
    var p = 0
    var records = Vector.empty[WarcRecord]
    // the CRLF-terminated line starting at `from`, or None past EOF /
    // if no terminator arrives (headers are US-ASCII by spec)
    def line(from: Int): Option[(String, Int)] = {
      var k = from
      while (k + 1 < blob.length) {
        if (blob(k) == '\r' && blob(k + 1) == '\n')
          return Some((new String(blob, from, k - from, "US-ASCII"), k + 2))
        k += 1
      }
      None
    }
    while (p < blob.length) {
      val (ver, afterVer) = line(p) match {
        case Some(v) => v
        case None => return None
      }
      if (ver != "WARC/1.0" && ver != "WARC/1.1") return None
      var q = afterVer
      var warcType: String = null
      var uri = ""
      var len = -1L
      var open = true
      while (open) {
        line(q) match {
          case None => return None
          case Some(("", next)) => open = false; q = next
          case Some((h, next)) =>
            val c = h.indexOf(':')
            if (c <= 0) return None // a header line must be Name: value
            val name = h.substring(0, c).trim.toLowerCase
            // field-name is a token — whitespace inside means a
            // mangled line whose first colon came from the VALUE
            // (e.g. a timestamp); refuse rather than mis-split
            if (name.exists(ch => ch == ' ' || ch == '\t')) return None
            val v = h.substring(c + 1).trim
            name match {
              case "warc-type" => warcType = v
              case "warc-target-uri" => uri = v
              case "content-length" =>
                len = try java.lang.Long.parseLong(v)
                catch { case _: NumberFormatException => return None }
              case _ => () // unknown headers are legal; carried past
            }
            q = next
        }
      }
      if (warcType == null || len < 0 || len > blob.length) return None
      if (q + len + 4 > blob.length) return None // content + CRLFCRLF
      if (blob(q + len.toInt) != '\r' || blob(q + len.toInt + 1) != '\n' ||
          blob(q + len.toInt + 2) != '\r' || blob(q + len.toInt + 3) != '\n')
        return None
      if (warcType == "response") {
        var s = 0L
        var j = 0
        while (j < len) { s += blob(q + j) & 0xff; j += 1 }
        records :+= WarcRecord(warcType, uri, len, s)
      }
      p = q + len.toInt + 4
    }
    if (records.isEmpty) None else Some(records)
  }

  /** One WARC record as standalone bytes — the unit `.warc.gz`
    * compresses per record. */
  private def recordBytes(headers: Seq[(String, String)],
                          content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeRecord(out, headers, content)
    out.toByteArray
  }

  /** The COMMON CRAWL wire format: each WARC record gzip-compressed
    * SEPARATELY, members concatenated — so a consumer can seek to a
    * record boundary and read one record without inflating the rest
    * of the file (RFC 1952 explicitly allows multi-member streams;
    * WARC-GZ mandates record-per-member). Same leading warcinfo +
    * shared synthetic members as [[encodeWarc]]. */
  def encodeWarcGz(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Archives.gzipBytes(recordBytes(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:doc$docId:info>",
      "WARC-Date" -> SynthDate),
      "software: graft-synth\r\n".getBytes("US-ASCII"))))
    (0 until Archives.membersOf(docId)).foreach { i =>
      val len = Archives.memberLenOf(docId, i)
      out.write(Archives.gzipBytes(recordBytes(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:doc$docId:$i>",
        "WARC-Date" -> SynthDate,
        "WARC-Target-URI" -> s"http://synth.graft/doc$docId/part$i"),
        Array.tabulate(len)(j => Archives.memberByteOf(docId, i, j).toByte))))
    }
    out.toByteArray
  }

  /** Walk a MULTI-MEMBER gzip stream (RFC 1952 §2.2: "a gzip file
    * consists of a series of members"): per member, header parse with
    * optional-field skipping, raw inflate tracking how many input
    * bytes the member consumed, CRC32 + ISIZE verified against ITS
    * OWN trailer, cursor advanced to the next member until exact EOF.
    * None on any malformation in ANY member — a flipped bit anywhere
    * refuses the whole stream ([[Archives.gunzip]]'s posture,
    * generalized). Single-member streams decode identically to
    * [[Archives.gunzip]]. */
  def gunzipMembers(blob: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream()
      var p = 0
      if (blob.length == 0) return None
      while (p < blob.length) {
        if (p + 18 > blob.length || (blob(p) & 0xff) != 0x1f ||
            (blob(p + 1) & 0xff) != 0x8b || (blob(p + 2) & 0xff) != 8)
          return None
        val flg = blob(p + 3) & 0xff
        var q = p + 10
        if ((flg & 4) != 0) {
          val xlen = (blob(q) & 0xff) | ((blob(q + 1) & 0xff) << 8)
          q += 2 + xlen
        }
        if ((flg & 8) != 0) { while (blob(q) != 0) q += 1; q += 1 }
        if ((flg & 16) != 0) { while (blob(q) != 0) q += 1; q += 1 }
        if ((flg & 2) != 0) q += 2
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(blob, q, blob.length - q)
        val member = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var done = inf.finished()
        while (!done) {
          val got = inf.inflate(buf)
          if (got > 0) member.write(buf, 0, got)
          done = inf.finished()
          if (!done && got == 0 &&
              (inf.needsInput() || inf.needsDictionary())) {
            inf.end(); return None
          }
        }
        // the member consumed exactly (input − remaining) deflate
        // bytes; its 8-byte trailer sits right after
        val trailerAt = blob.length - inf.getRemaining
        inf.end()
        if (trailerAt + 8 > blob.length) return None
        val bytes = member.toByteArray
        val crc = new java.util.zip.CRC32()
        crc.update(bytes)
        def le32(off: Int): Long =
          (blob(off) & 0xffL) | ((blob(off + 1) & 0xffL) << 8) |
            ((blob(off + 2) & 0xffL) << 16) | ((blob(off + 3) & 0xffL) << 24)
        if (le32(trailerAt) != crc.getValue) return None
        if (le32(trailerAt + 4) != (bytes.length.toLong & 0xffffffffL))
          return None
        out.write(bytes)
        p = trailerAt + 8
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** gunzip-members ∘ warc-walk — the `.warc.gz` read path: every
    * gate of BOTH layers (per-member CRC32/ISIZE, version/header
    * grammar, separators) guards the same rows. */
  def decodeWarcGz(blob: Array[Byte]): Option[Vector[WarcRecord]] =
    gunzipMembers(blob).flatMap(decodeWarc)

  /** Same witnesses as [[mmWarc]], recovered through the per-record
    * gzip layer — shares the tar oracle SQL verbatim, like
    * mm_tar_gz over mm_tar. */
  def mmWarcGz(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodeWarcGz(id))))
      .mapPartitions(_.flatMap { m =>
        decodeWarcGz(m.blob).map { rs =>
          WarcInfo(m.doc_id, rs.size.toLong, rs.map(_.size).sum,
            rs.map(_.payload_sum).sum)
        }
      })
      .toDF()
      .select(col("doc_id"), col("n_members"), col("total_bytes"),
        col("payload_sum"))
  }

  def warcMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodeWarc(id))))
  }

  final case class WarcInfo(doc_id: Long, n_members: Long,
                            total_bytes: Long, payload_sum: Long)

  /** Per-file rollup of ANY relation of WARC blobs — the batch core
    * the streaming ingest
    * ([[graft.streaming.StreamingOps.warcIngestStream]]) mirrors. */
  def warcInfoOf(media: Dataset[MediaRow]): Dataset[WarcInfo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeWarc(m.blob).map { rs =>
        WarcInfo(m.doc_id, rs.size.toLong, rs.map(_.size).sum,
          rs.map(_.payload_sum).sum)
      }
    })
  }

  /** Driver-gated WARC walk: response count, total response bytes,
    * and the integer payload sum — the SAME witnesses, over the SAME
    * member relation, as mm_tar/mm_zip/mm_tar_gz (oracle SQL shared
    * verbatim). A skipped response, a cursor mis-advance at a
    * separator, or bytes read from the wrong offset move a witness;
    * the warcinfo record contributing anything breaks all three. */
  def mmWarc(spark: SparkSession, dir: String): DataFrame =
    warcInfoOf(warcMedia(spark, dir))
      .toDF()
      .select(col("doc_id"), col("n_members"), col("total_bytes"),
        col("payload_sum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_warc" -> mmWarc,
    "mm_warc_gz" -> mmWarcGz)

  val oracles: Map[String, String] = Map(
    "mm_warc" -> Archives.tarInfoSql,
    "mm_warc_gz" -> Archives.tarInfoSql)
}
