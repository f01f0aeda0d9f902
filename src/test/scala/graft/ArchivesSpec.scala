package graft

import graft.operators.Archives

/** Archive containers: the oracle pins counts/sums over the corpus;
  * this spec covers what it cannot — member-exact tar walks, header
  * integrity (checksum, magic), typeflag handling, and the gzip
  * CRC/ISIZE gates — plus the corruption posture (None, never
  * garbage). */
class ArchivesSpec extends SparkSessionSpec {

  test("tar: members round-trip exactly — names, sizes, payload bytes") {
    (0L until 20L).foreach { id =>
      val ms = Archives.decodeTar(Archives.encodeTar(id)).get
      assert(ms.size == Archives.membersOf(id), s"doc $id")
      ms.zipWithIndex.foreach { case (m, i) =>
        assert(m.name == s"doc$id/part$i.txt", s"doc $id member $i")
        val len = Archives.memberLenOf(id, i)
        assert(m.size == len.toLong)
        assert(m.payload_sum ==
          (0 until len).map(Archives.memberByteOf(id, i, _).toLong).sum)
      }
    }
  }

  test("tar: corruption and structure violations refuse") {
    val good = Archives.encodeTar(5L)
    // flipped payload byte → checksum of the header still fine, but a
    // flipped HEADER byte must fail the checksum
    val badHdr = good.clone()
    badHdr(3) = (badHdr(3) ^ 0x11).toByte // inside the name field
    assert(Archives.decodeTar(badHdr).isEmpty, "checksum must catch")
    // truncation: mid-header, mid-payload, missing end blocks
    assert(Archives.decodeTar(good.take(100)).isEmpty)
    assert(Archives.decodeTar(good.take(600)).isEmpty)
    assert(Archives.decodeTar(good.dropRight(1024)).isEmpty,
      "missing end-of-archive must refuse")
    // non-octal size field
    val badSize = good.clone()
    badSize(124) = 'z'.toByte
    assert(Archives.decodeTar(badSize).isEmpty)
    // a directory member (typeflag 5) is skipped, not emitted
    val dir = good.clone()
    dir(156) = '5'.toByte
    // fix the checksum for the edit
    var sum = 0L
    for (k <- 0 until 512)
      sum += (if (k >= 148 && k < 156) ' '.toInt else dir(k) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    val pad = "0" * (6 - cs.length) + cs
    System.arraycopy(pad.getBytes("US-ASCII"), 0, dir, 148, 6)
    dir(154) = 0; dir(155) = ' '
    val ms = Archives.decodeTar(dir).get
    assert(ms.size == Archives.membersOf(5L) - 1,
      "typeflag-5 member must be skipped but cursor still advances")
  }

  test("gzip: round-trip recovers text; CRC and ISIZE gate") {
    for (text <- Seq("", "one", "hello world  double  spaces",
                     "unicode: é中文 end", "a " * 500)) {
      val g = Archives.decodeGzip(1L, Archives.encodeGzip(text)).get
      assert(g.n_bytes == text.getBytes("UTF-8").length.toLong, s"'$text'")
      assert(g.n_toks == text.split(" ", -1).length.toLong, s"'$text'")
    }
    val good = Archives.encodeGzip("the quick brown fox")
    // flip one deflate byte: CRC must reject (never silent garbage)
    val bad = good.clone()
    bad(12) = (bad(12) ^ 0x40).toByte
    assert(Archives.decodeGzip(1L, bad).isEmpty)
    // truncations at header / body / trailer
    for (cut <- Seq(5, 12, good.length - 4, good.length - 1))
      assert(Archives.decodeGzip(1L, good.take(cut)).isEmpty, s"cut=$cut")
    // wrong magic
    val m = good.clone(); m(0) = 0x1e.toByte
    assert(Archives.decodeGzip(1L, m).isEmpty)
    // FNAME flag: a named member still decodes
    val named = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 3)
      out.write(8) // FLG = FNAME
      out.write(good, 4, 6)
      out.write("file.txt".getBytes("US-ASCII")); out.write(0)
      out.write(good, 10, good.length - 10)
      out.toByteArray
    }
    assert(Archives.decodeGzip(1L, named).isDefined,
      "FNAME header must be skipped")
  }

  test("zip: members round-trip; CRC, EOCD, and stored-only gates hold") {
    // same member relation as tar, through the zip grammar
    (0L until 20L).foreach { id =>
      val zs = Archives.decodeZip(Archives.encodeZip(id)).get
      val ts = Archives.decodeTar(Archives.encodeTar(id)).get
      assert(zs == ts, s"doc $id: zip and tar must agree member-for-member")
    }
    val good = Archives.encodeZip(5L)
    // a flipped payload byte fails the member CRC (member 0's data
    // starts after the 30-byte local header + 14-byte name)
    val bad = good.clone()
    bad(46) = (bad(46) ^ 0x20).toByte
    assert(Archives.decodeZip(bad).isEmpty)
    // truncated EOCD / missing central directory refuse
    assert(Archives.decodeZip(good.take(good.length - 10)).isEmpty)
    assert(Archives.decodeZip(good.take(40)).isEmpty)
    // a compressed member (method != 0) is out of scope → None
    val deflated = good.clone()
    val cdAt = (0 until deflated.length - 4).find(i =>
      (deflated(i) & 0xff) == 0x50 && (deflated(i + 1) & 0xff) == 0x4b &&
      (deflated(i + 2) & 0xff) == 0x01 && (deflated(i + 3) & 0xff) == 0x02).get
    deflated(cdAt + 10) = 8 // method = deflate in the CD entry
    assert(Archives.decodeZip(deflated).isEmpty)
    // garbage
    assert(Archives.decodeZip(Array.fill(100)(9.toByte)).isEmpty)
  }

  test("dedup_members: md5 groups are true content equality") {
    // find a duplicate group from the member relation, then compare
    // the ACTUAL payload bytes of its members byte-for-byte
    val rows = Archives.tarMemberRows(spark, sf0001).collect()
    val groups = rows.groupBy(r => (r.content_md5, r.size))
    val dup = groups.values.find(_.length >= 2)
      .getOrElse(fail("fixture must contain a cross-archive duplicate"))
    def payloadOf(docId: Long, name: String): Array[Byte] = {
      val ms = Archives.decodeTar(Archives.encodeTar(docId)).get
      val i = ms.indexWhere(_.name == name)
      val len = ms(i).size.toInt
      Array.tabulate(len)(j => Archives.memberByteOf(docId, i, j).toByte)
    }
    val ref = payloadOf(dup(0).doc_id, dup(0).name)
    dup.tail.foreach { m =>
      assert(payloadOf(m.doc_id, m.name).sameElements(ref),
        s"md5 group must be byte-identical: ${m.doc_id}/${m.name}")
    }
    // and two members from different groups must differ
    val other = groups.values.find(g => g.head.content_md5 !=
      dup.head.content_md5 && g.head.size == dup.head.size)
    other.foreach { g =>
      assert(!payloadOf(g.head.doc_id, g.head.name).sameElements(ref))
    }
  }

  test("pack_tar: written shards round-trip every document byte-exactly") {
    import org.apache.spark.sql.functions.col
    // rebuild one shard the way the writer does and verify the
    // archive's members recover the source texts exactly
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val shard0 = docs.filter(_._1 % Archives.PackShards == 0).sortBy(_._1)
    val blob = Archives.buildTar(shard0.map { case (id, text) =>
      (s"doc$id.txt", text.getBytes("UTF-8"))
    }.toSeq)
    val ms = Archives.decodeTar(blob).get
    assert(ms.size == shard0.length)
    ms.zip(shard0).foreach { case (m, (id, text)) =>
      assert(m.name == s"doc$id.txt")
      val bytes = text.getBytes("UTF-8")
      assert(m.size == bytes.length.toLong)
      assert(m.payload_sum == bytes.map(b => (b & 0xff).toLong).sum,
        s"doc $id payload must round-trip byte-exactly")
    }
    // .tar.gz composition: gunzip∘decodeTar recovers the same members
    val gz = Archives.gzipBytes(blob)
    assert(Archives.gunzip(gz).get.sameElements(blob))
    assert(Archives.decodeTarGzInfo(0L, Archives.encodeTarGz(5L)).get ==
      Archives.decodeTarInfo(0L, Archives.encodeTar(5L)).get)
    // a flipped byte anywhere in the .tar.gz fails the gzip CRC
    val bad = gz.clone(); bad(gz.length / 2) = (bad(gz.length / 2) ^ 1).toByte
    assert(Archives.gunzip(bad).isEmpty)
  }

  test("mm_tar and mm_gzip_text emit one row per document at sf0.001") {
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(Archives.mmTar(spark, sf0001).count() == n)
    assert(Archives.mmGzipText(spark, sf0001).count() == n)
  }
}
