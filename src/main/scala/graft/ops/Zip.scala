package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

/** Dependency-free ZIP container codec (PKWARE APPNOTE layout) — the
  * first of the ARCHIVE container family (ZIP / multi-member GZIP /
  * ustar TAR / WARC): web-scale corpora arrive as archives of many
  * small documents, and a pipeline that can only read loose files
  * re-shards at the wrong granularity. The reference ingests a loose
  * directory of PDFs (app/main.py:10,139); at 100 TB the same corpus
  * ships as container files whose ENTRIES are the documents, so the
  * engine must open containers on the executor, never the driver.
  *
  * Format notes (public APPNOTE.TXT):
  *   - per entry: local file header (sig 0x04034b50) + entry bytes;
  *   - after all entries: central directory (one 0x02014b50 record per
  *     entry, carrying the local-header offset) + end-of-central-
  *     directory record (0x06054b50, which may be followed by a
  *     variable-length archive comment);
  *   - correct readers locate the EOCD by scanning BACKWARD from the
  *     end (comment makes the tail variable), then walk the CENTRAL
  *     directory — never the local headers, whose sizes may be
  *     deferred to data descriptors;
  *   - compression methods: 0 = stored, 8 = raw DEFLATE (RFC 1951,
  *     no zlib wrapper — the `nowrap` Inflater mode);
  *   - every entry carries the CRC-32 of the UNCOMPRESSED bytes; a
  *     decode that skips the check returns corrupt text silently.
  *
  * All integers little-endian. Streamed entries (bit 3 data
  * descriptors — what JDK ZipOutputStream and most real writers emit)
  * are read correctly because sizes come from the central directory.
  * Deliberately unsupported (loud): ZIP64, encryption, methods other
  * than 0/8. ArchiveSpec gates both directions against
  * `java.util.zip`'s independent implementation.
  *
  * Scale: encode/decode are per-payload byte loops inside the executor
  * (archives built/opened in the scan stage, grouped so one archive is
  * one task's work) — identical altitude to the media codecs.
  */
object Zip {

  private final val LocalSig = 0x04034b50
  private final val CentralSig = 0x02014b50
  private final val EocdSig = 0x06054b50

  private def le16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte; out += ((v >>> 8) & 0xff).toByte
  }
  private def le32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += (v & 0xff).toByte; out += ((v >>> 8) & 0xff).toByte
    out += ((v >>> 16) & 0xff).toByte; out += ((v >>> 24) & 0xff).toByte
  }

  private[ops] def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new ArrayBuffer[Byte]()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out ++= buf.view.slice(0, n)
    }
    d.end()
    out.toArray
  }

  private[ops] def inflateRaw(data: Array[Byte], off: Int, len: Int,
      expect: Int): Array[Byte] = {
    val inf = new Inflater(true)
    inf.setInput(data, off, len)
    val out = new Array[Byte](expect)
    var got = 0
    // drive at least one inflate() even when expect == 0: an empty
    // entry still carries a (2-byte) deflate stream whose final block
    // must be consumed for finished() to flip
    while (!inf.finished()) {
      val n = inf.inflate(out, got, expect - got)
      require(n > 0 || inf.finished(),
        "zip: truncated or oversized deflate stream")
      got += n
    }
    require(got == expect,
      s"zip: deflate stream yielded $got of $expect bytes")
    inf.end()
    out
  }

  private def crc32(data: Array[Byte]): Long = {
    val c = new CRC32(); c.update(data); c.getValue
  }

  /** Build a ZIP archive from (entryName, content) pairs. Entries
    * shorter than 64 bytes are STORED (method 0 — deflate overhead
    * exceeds the win), the rest raw-DEFLATEd (method 8); names are
    * UTF-8 (general-purpose bit 11 set, the modern convention).
    */
  def encode(entries: Seq[(String, Array[Byte])],
      comment: String = ""): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    val central = new ArrayBuffer[Byte]()
    var count = 0
    entries.foreach { case (name, data) =>
      val nameB = name.getBytes("UTF-8")
      val method = if (data.length < 64) 0 else 8
      val packed = if (method == 0) data else deflateRaw(data)
      val crc = crc32(data)
      val offset = out.length.toLong
      le32(out, LocalSig); le16(out, 20); le16(out, 1 << 11)
      le16(out, method); le16(out, 0); le16(out, 0) // time, date
      le32(out, crc); le32(out, packed.length.toLong)
      le32(out, data.length.toLong)
      le16(out, nameB.length); le16(out, 0) // extra len
      out ++= nameB; out ++= packed
      le32(central, CentralSig); le16(central, 20); le16(central, 20)
      le16(central, 1 << 11); le16(central, method)
      le16(central, 0); le16(central, 0)
      le32(central, crc); le32(central, packed.length.toLong)
      le32(central, data.length.toLong)
      le16(central, nameB.length); le16(central, 0); le16(central, 0)
      le16(central, 0); le16(central, 0) // disk, internal attrs
      le32(central, 0) // external attrs
      le32(central, offset)
      central ++= nameB
      count += 1
    }
    val cdOff = out.length.toLong
    out ++= central
    val commentB = comment.getBytes("UTF-8")
    le32(out, EocdSig); le16(out, 0); le16(out, 0)
    le16(out, count); le16(out, count)
    le32(out, central.length.toLong); le32(out, cdOff)
    le16(out, commentB.length); out ++= commentB
    out.toArray
  }

  private def rd16(a: Array[Byte], p: Int): Int =
    (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
  private def rd32(a: Array[Byte], p: Int): Long =
    (a(p) & 0xffL) | ((a(p + 1) & 0xffL) << 8) |
      ((a(p + 2) & 0xffL) << 16) | ((a(p + 3) & 0xffL) << 24)

  /** Parse a ZIP archive to (entryName, content) pairs, central-
    * directory-first (the correct read path), verifying each entry's
    * CRC-32 and sizes. Loud on any malformation.
    */
  def decode(zip: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(zip.length >= 22, "zip: shorter than an EOCD record")
    // EOCD: scan backward over the (≤64 KiB) comment tail
    var eocd = -1
    var p = zip.length - 22
    val floor = math.max(0, zip.length - 22 - 0xffff)
    while (eocd < 0 && p >= floor) {
      if (rd32(zip, p) == EocdSig &&
        p + 22 + rd16(zip, p + 20) == zip.length) eocd = p
      p -= 1
    }
    require(eocd >= 0, "zip: end-of-central-directory record not found")
    val count = rd16(zip, eocd + 10)
    require(rd16(zip, eocd + 8) == count, "zip: multi-disk archives unsupported")
    var cd = rd32(zip, eocd + 16).toInt
    (0 until count).map { _ =>
      require(rd32(zip, cd) == CentralSig, "zip: bad central-directory signature")
      val method = rd16(zip, cd + 10)
      val crc = rd32(zip, cd + 16)
      val csize = rd32(zip, cd + 20).toInt
      val usize = rd32(zip, cd + 24).toInt
      val nameLen = rd16(zip, cd + 28)
      val extraLen = rd16(zip, cd + 30)
      val commentLen = rd16(zip, cd + 32)
      val lho = rd32(zip, cd + 42).toInt
      val name = new String(zip, cd + 46, nameLen, "UTF-8")
      require(rd32(zip, lho) == LocalSig, s"zip: bad local header for $name")
      // Streaming writers (JDK ZipOutputStream included) set bit 3 and
      // zero the LOCAL sizes, appending a data descriptor after the
      // data. Central-directory-first reading makes that a non-event:
      // csize/usize/crc above came from the CD, which is always
      // authoritative, and the descriptor bytes are simply never
      // visited (entry positions come from CD offsets, not scanning).
      // local name/extra lengths may differ from central — honor local
      val dataOff = lho + 30 + rd16(zip, lho + 26) + rd16(zip, lho + 28)
      val data = method match {
        case 0 =>
          require(csize == usize, s"zip: stored entry size mismatch ($name)")
          java.util.Arrays.copyOfRange(zip, dataOff, dataOff + csize)
        case 8 => inflateRaw(zip, dataOff, csize, usize)
        case m => throw new IllegalArgumentException(
          s"zip: unsupported compression method $m ($name)")
      }
      require(crc32(data) == crc, s"zip: CRC mismatch for entry $name")
      cd += 46 + nameLen + extraLen + commentLen
      (name, data)
    }
  }
}
