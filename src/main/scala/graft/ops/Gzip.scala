package graft.ops

import java.util.zip.{CRC32, Inflater}

import scala.collection.mutable.ArrayBuffer

/** Dependency-free multi-member GZIP codec (RFC 1952) — the archive
  * family's STREAM shape: Common-Crawl WET/WARC shards are gzip files
  * whose members are individual records concatenated back-to-back, so
  * a splittable reader can seek to a member boundary and decompress
  * one document without touching the rest. A gzip reader that stops
  * at the first member's trailer (a classic bug — JDK GZIPInputStream
  * had it for years) silently drops the corpus tail, so the decoder
  * here LOOPS members until the buffer is exhausted and rejects
  * trailing garbage loudly.
  *
  * Format notes (public RFC 1952):
  *   - member = 10-byte header (magic 1f 8b, CM=8 deflate, FLG, MTIME,
  *     XFL, OS) + optional FEXTRA/FNAME/FCOMMENT/FHCRC fields + raw
  *     DEFLATE stream + CRC-32 + ISIZE (uncompressed length mod 2^32),
  *     both little-endian;
  *   - FNAME/FCOMMENT are NUL-terminated Latin-1; FEXTRA is
  *     length-prefixed; FHCRC is the low 16 bits of the header CRC;
  *   - reserved FLG bits (5–7) must be zero — set bits mean a format
  *     this reader would misparse, so it refuses them.
  *
  * CRC-32 and ISIZE are VERIFIED per member — a corrupt shard fails
  * the task loudly instead of feeding garbage text downstream.
  * ArchiveSpec gates both directions against `java.util.zip`'s
  * independent implementation.
  *
  * Scale: same executor-side altitude as the media codecs; one member
  * per document is what makes the shard splittable at 100 TB.
  */
object Gzip {

  private final val Magic0 = 0x1f
  private final val Magic1 = 0x8b
  private final val FHCRC = 1 << 1
  private final val FEXTRA = 1 << 2
  private final val FNAME = 1 << 3
  private final val FCOMMENT = 1 << 4

  /** One gzip member wrapping `data`, with an optional FNAME header. */
  def encodeMember(data: Array[Byte], name: Option[String] = None): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out += Magic0.toByte; out += Magic1.toByte; out += 8.toByte
    out += (if (name.isDefined) FNAME else 0).toByte
    out ++= Array[Byte](0, 0, 0, 0) // MTIME unset (deterministic output)
    out += 0.toByte // XFL
    out += 255.toByte // OS unknown
    name.foreach { n => out ++= n.getBytes("ISO-8859-1"); out += 0.toByte }
    out ++= Zip.deflateRaw(data)
    val c = new CRC32(); c.update(data)
    var v = c.getValue
    (0 until 4).foreach { _ => out += (v & 0xff).toByte; v >>>= 8 }
    var sz = data.length.toLong & 0xffffffffL
    (0 until 4).foreach { _ => out += (sz & 0xff).toByte; sz >>>= 8 }
    out.toArray
  }

  /** Concatenate per-record members — the WET-shard layout. */
  def encodeMembers(records: Seq[(Option[String], Array[Byte])]): Array[Byte] =
    records.iterator.flatMap { case (n, d) => encodeMember(d, n) }.toArray

  /** Decode EVERY member of a (possibly multi-member) gzip buffer to
    * (FNAME, content) pairs, verifying per-member CRC-32 + ISIZE.
    * Loud on reserved flags, truncation, checksum mismatch, or
    * trailing garbage.
    */
  def decode(gz: Array[Byte]): Seq[(Option[String], Array[Byte])] = {
    val out = ArrayBuffer.empty[(Option[String], Array[Byte])]
    var p = 0
    while (p < gz.length) {
      require(gz.length - p >= 18, "gzip: truncated member header")
      require((gz(p) & 0xff) == Magic0 && (gz(p + 1) & 0xff) == Magic1,
        f"gzip: bad magic at offset $p")
      require(gz(p + 2) == 8, "gzip: compression method must be 8 (deflate)")
      val flg = gz(p + 3) & 0xff
      require((flg & 0xe0) == 0, f"gzip: reserved FLG bits set (0x$flg%02x)")
      var q = p + 10
      if ((flg & FEXTRA) != 0) {
        val xlen = (gz(q) & 0xff) | ((gz(q + 1) & 0xff) << 8)
        q += 2 + xlen
      }
      var name: Option[String] = None
      if ((flg & FNAME) != 0) {
        val start = q
        while (gz(q) != 0) q += 1
        name = Some(new String(gz, start, q - start, "ISO-8859-1"))
        q += 1
      }
      if ((flg & FCOMMENT) != 0) { while (gz(q) != 0) q += 1; q += 1 }
      if ((flg & FHCRC) != 0) {
        val c = new CRC32(); c.update(gz, p, q - p)
        val want = (gz(q) & 0xff) | ((gz(q + 1) & 0xff) << 8)
        require((c.getValue & 0xffff) == want, "gzip: header CRC mismatch")
        q += 2
      }
      val inf = new Inflater(true)
      inf.setInput(gz, q, gz.length - q)
      val chunk = new Array[Byte](8192)
      val body = new ArrayBuffer[Byte]()
      while (!inf.finished()) {
        val n = inf.inflate(chunk)
        require(n > 0 || inf.finished(), "gzip: truncated deflate stream")
        body ++= chunk.view.slice(0, n)
      }
      val consumed = (gz.length - q) - inf.getRemaining
      inf.end()
      val data = body.toArray
      val tp = q + consumed
      require(gz.length - tp >= 8, "gzip: truncated member trailer")
      def le32(at: Int): Long =
        (gz(at) & 0xffL) | ((gz(at + 1) & 0xffL) << 8) |
          ((gz(at + 2) & 0xffL) << 16) | ((gz(at + 3) & 0xffL) << 24)
      val c = new CRC32(); c.update(data)
      require(c.getValue == le32(tp), "gzip: CRC-32 mismatch")
      require((data.length.toLong & 0xffffffffL) == le32(tp + 4),
        "gzip: ISIZE mismatch")
      out += ((name, data))
      p = tp + 8
    }
    out.toSeq
  }
}
