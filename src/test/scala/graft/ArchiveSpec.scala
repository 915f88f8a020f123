package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream, ZipEntry, ZipInputStream, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Gzip, Tar, Warc, Zip}

/** Archive container codecs (SURVEY.md §2.40): round-trip fidelity,
  * the malformation rejections the constant-oracle queries cannot
  * reach, and — for the two formats the JDK also implements —
  * INTEROP in both directions against `java.util.zip`, an
  * independent implementation (the JpegSpec cross-gate discipline).
  */
class ArchiveSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  private val entries: Seq[(String, Array[Byte])] = Seq(
    ("small.txt", bytes("tiny")), // < 64 B → stored
    ("empty.txt", Array.empty[Byte]),
    ("big.txt", bytes("lorem ipsum " * 400)), // compressible → deflated
    ("noise.bin", Array.tabulate[Byte](4096)(i =>
      ((i * 1103515245 + 12345) >>> 16).toByte)) // incompressible deflate
  )

  // ------------------------------------------------------------- zip

  test("zip: round-trip over stored/deflated/empty/incompressible entries") {
    val back = Zip.decode(Zip.encode(entries))
    assert(back.map(_._1) === entries.map(_._1))
    back.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("zip: EOCD found behind an archive comment") {
    val z = Zip.encode(entries, comment = "a" * 1000)
    assert(Zip.decode(z).map(_._1) === entries.map(_._1))
  }

  test("zip: corrupting one payload byte fails the CRC loudly") {
    val z = Zip.encode(Seq(("x.txt", bytes("lorem ipsum " * 100))))
    // flip a byte inside the deflate stream (after the 30 B header + name)
    z(40) = (z(40) ^ 0x01).toByte
    // failure surfaces as a CRC mismatch or, if the flip breaks the
    // deflate structure itself, as an Inflater DataFormatException —
    // loud either way, never silent corruption
    intercept[Exception](Zip.decode(z))
  }

  test("zip: interop — java.util.zip reads our archive") {
    val zin = new ZipInputStream(new ByteArrayInputStream(Zip.encode(entries)))
    val got = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .map { e =>
        val buf = new ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = zin.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
        (e.getName, buf.toByteArray)
      }.toSeq
    assert(got.map(_._1) === entries.map(_._1))
    got.zip(entries).foreach { case ((_, g), (_, w)) =>
      assert(g.toSeq === w.toSeq)
    }
  }

  test("zip: interop — we read a java.util.zip archive") {
    val buf = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(buf)
    entries.foreach { case (n, d) =>
      zout.putNextEntry(new ZipEntry(n)); zout.write(d); zout.closeEntry()
    }
    zout.close()
    val back = Zip.decode(buf.toByteArray)
    assert(back.map(_._1) === entries.map(_._1))
    back.zip(entries).foreach { case ((_, g), (_, w)) =>
      assert(g.toSeq === w.toSeq)
    }
  }

  // ------------------------------------------------------------ gzip

  test("gzip: multi-member round-trip with FNAME headers") {
    val recs: Seq[(Option[String], Array[Byte])] = Seq(
      (Some("a"), bytes("first record")),
      (None, bytes("anonymous " * 50)),
      (Some("c"), Array.empty[Byte]))
    val back = Gzip.decode(Gzip.encodeMembers(recs))
    assert(back.map(_._1) === recs.map(_._1))
    back.zip(recs).foreach { case ((_, g), (_, w)) =>
      assert(g.toSeq === w.toSeq)
    }
  }

  test("gzip: FEXTRA + FHCRC member fields are parsed past, not choked on") {
    // hand-build a header with FEXTRA(4 bytes) + FNAME + FHCRC
    val body = bytes("payload body")
    val plain = Gzip.encodeMember(body, Some("n"))
    val hdr = scala.collection.mutable.ArrayBuffer[Byte](
      0x1f.toByte, 0x8b.toByte, 8,
      (2 | 4 | 8).toByte, // FHCRC | FEXTRA | FNAME
      0, 0, 0, 0, 0, 255.toByte)
    hdr ++= Seq[Byte](4, 0, 1, 2, 3, 4) // FEXTRA: xlen=4 + 4 bytes
    hdr ++= "n".getBytes("ISO-8859-1"); hdr += 0
    val c = new java.util.zip.CRC32(); c.update(hdr.toArray)
    hdr += (c.getValue & 0xff).toByte
    hdr += ((c.getValue >> 8) & 0xff).toByte
    val member = hdr.toArray ++ plain.drop(12) // reuse deflate+trailer ("n\0" is 2 B)
    val back = Gzip.decode(member)
    assert(back.length === 1)
    assert(back.head._1 === Some("n"))
    assert(back.head._2.toSeq === body.toSeq)
  }

  test("gzip: corrupt CRC, bad ISIZE, reserved flags, trailing garbage all loud") {
    val m = Gzip.encodeMember(bytes("hello world, hello world"))
    val crcBad = m.clone(); crcBad(m.length - 8) = (crcBad(m.length - 8) ^ 1).toByte
    assert(intercept[Exception](Gzip.decode(crcBad)).getMessage.contains("CRC"))
    val szBad = m.clone(); szBad(m.length - 4) = (szBad(m.length - 4) ^ 1).toByte
    assert(intercept[Exception](Gzip.decode(szBad)).getMessage.contains("ISIZE"))
    val flgBad = m.clone(); flgBad(3) = (flgBad(3) | 0x80).toByte
    assert(intercept[Exception](Gzip.decode(flgBad)).getMessage.contains("reserved"))
    assert(intercept[Exception](
      Gzip.decode(m ++ bytes("junk"))).getMessage.nonEmpty)
  }

  test("gzip: interop — GZIPInputStream reads our member; we read " +
    "GZIPOutputStream's, including JDK-concatenated members") {
    val data = bytes("interoperability " * 100)
    val jin = new GZIPInputStream(new ByteArrayInputStream(Gzip.encodeMember(data)))
    val buf = new ByteArrayOutputStream()
    val chunk = new Array[Byte](4096)
    var n = jin.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = jin.read(chunk) }
    assert(buf.toByteArray.toSeq === data.toSeq)
    def jdkGz(d: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(b); g.write(d); g.close(); b.toByteArray
    }
    val two = jdkGz(bytes("member one")) ++ jdkGz(bytes("member two"))
    val back = Gzip.decode(two)
    assert(back.map(r => new String(r._2, "UTF-8")) ===
      Seq("member one", "member two"))
  }

  // ------------------------------------------------------------- tar

  test("tar: round-trip with 512-block padding and terminator") {
    val t = Tar.encode(entries)
    assert(t.length % 512 === 0)
    assert(t.view.slice(t.length - 1024, t.length).forall(_ == 0))
    val back = Tar.decode(t)
    assert(back.map(_._1) === entries.map(_._1))
    back.zip(entries).foreach { case ((_, g), (_, w)) =>
      assert(g.toSeq === w.toSeq)
    }
  }

  test("tar: header corruption fails the checksum loudly; long names refused") {
    val t = Tar.encode(Seq(("f.txt", bytes("data"))))
    t(0) = 'x'.toByte // corrupt the name without fixing the checksum
    assert(intercept[Exception](Tar.decode(t)).getMessage.contains("checksum"))
    assert(intercept[Exception](
      Tar.encode(Seq(("n" * 101, bytes("x"))))).getMessage.contains("100"))
  }

  // ------------------------------------------------------------ warc

  test("warc: length framing survives a block containing 'WARC/1.0' and " +
    "blank lines; warcinfo skipped by type; headers case-insensitive") {
    val trap = bytes("WARC/1.0\r\n\r\nnot a real record\r\n\r\nmore text")
    val shard = Warc.encodeShard(
      Seq("WARC-Filename" -> "t.warc"),
      Seq(
        (Seq("WARC-Type" -> "response", "WARC-Record-ID" -> "<r1>"), trap),
        (Seq("warc-type" -> "response", "WARC-Record-ID" -> "<r2>"),
          bytes("plain"))))
    val recs = Warc.decode(shard)
    assert(recs.length === 3)
    assert(recs.head.header("warc-TYPE") === Some("warcinfo"))
    val responses = recs.filter(_.header("WARC-Type").contains("response"))
    assert(responses.length === 2)
    assert(responses.head.block.toSeq === trap.toSeq)
    assert(responses.head.header("CONTENT-length") ===
      Some(trap.length.toString))
  }

  test("warc.gz: one gzip member per record — record-count conservation, " +
    "round-trip fidelity, and a corrupt member fails its own CRC loudly") {
    // the q_warc_gz composition (VERDICT r15 #2): member split first,
    // length-framed WARC parse per member
    val docs = Seq(
      ("<r1>", bytes("alpha " * 50)),
      ("<r2>", bytes("WARC/1.0\r\n\r\nembedded trap")),
      ("<r3>", Array.empty[Byte]))
    val info = Warc.encodeRecord(
      Seq("WARC-Type" -> "warcinfo", "WARC-Filename" -> "t.warc.gz"),
      bytes("software: graft\r\n"))
    val members = info +: docs.map { case (id, b) =>
      Warc.encodeRecord(
        Seq("WARC-Type" -> "response", "WARC-Record-ID" -> id), b)
    }
    val shard = members.iterator.flatMap(Gzip.encodeMember(_)).toArray
    val split = Gzip.decode(shard)
    assert(split.length === members.length,
      "record-count conservation: one gzip member per WARC record")
    val recs = split.flatMap { case (_, m) => Warc.decode(m) }
    assert(recs.length === members.length)
    assert(recs.head.header("WARC-Type") === Some("warcinfo"))
    val responses = recs.filter(_.header("WARC-Type").contains("response"))
    assert(responses.map(_.header("WARC-Record-ID").get) ===
      docs.map(_._1))
    assert(responses.map(_.block.toSeq) === docs.map(_._2.toSeq))
    // flip one payload byte inside the SECOND member: only that
    // member's CRC-32 trips, and it trips loudly
    val m1len = Gzip.encodeMember(members.head).length
    val corrupt = shard.clone()
    corrupt(m1len + 20) = (corrupt(m1len + 20) ^ 0x01).toByte
    assert(intercept[Exception](Gzip.decode(corrupt))
      .getMessage.toLowerCase.contains("crc"))
  }

  test("warc: truncation, bad version, missing Content-Length all loud") {
    val rec = Warc.encodeRecord(
      Seq("WARC-Type" -> "response"), bytes("hello"))
    assert(intercept[Exception](
      Warc.decode(rec.dropRight(3))).getMessage.nonEmpty)
    val badVer = bytes("WARC/9.9\r\n") ++ rec.drop(10)
    assert(intercept[Exception](Warc.decode(badVer)).getMessage.contains("version"))
    val noLen = bytes("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")
    assert(intercept[Exception](Warc.decode(noLen)).getMessage.contains("Content-Length"))
  }
}
