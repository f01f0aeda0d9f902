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
    "mm_warc" -> mmWarc)

  val oracles: Map[String, String] = Map(
    "mm_warc" -> Archives.tarInfoSql)
}
