package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Dependency-free WARC/1.0 record codec (ISO 28500) — the archive
  * family's WEB-CRAWL shape and the single most important container
  * for LLM training data: Common Crawl publishes every crawl as WARC
  * (raw responses), WAT (metadata) and WET (extracted text) shards,
  * all of which are WARC records. A corpus pipeline that cannot open
  * WARC records re-ingests the web through somebody else's extractor.
  *
  * Format notes (public ISO 28500 / IIPC spec):
  *   - record = version line `WARC/1.0` CRLF, header lines
  *     (`Name: value`, names CASE-INSENSITIVE), blank line (CRLF),
  *     then EXACTLY Content-Length bytes of block, then CRLF CRLF;
  *   - framing is LENGTH-BASED, never delimiter-based: the block may
  *     itself contain `WARC/1.0` or blank lines (an HTML page quoting
  *     a WARC spec must not break the reader) — the classic trap this
  *     codec's spec pins;
  *   - `WARC-Type` distinguishes warcinfo / request / response /
  *     metadata / conversion records; files conventionally open with
  *     a warcinfo record that content consumers must SKIP, not choke
  *     on;
  *   - real shards gzip each record as its own member ([[Gzip]]
  *     handles that layer; composing the two is exactly how .warc.gz
  *     is specified).
  *
  * Scale: records are parsed inside the executor from grouped shard
  * payloads — one shard per task, documents never leave the scan
  * stage un-projected.
  */
object Warc {

  final case class Record(headers: Seq[(String, String)], block: Array[Byte]) {
    /** Case-insensitive header lookup (the spec's comparison rule). */
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Serialize one record; Content-Length is computed, not trusted. */
  def encodeRecord(headers: Seq[(String, String)],
      block: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out ++= "WARC/1.0".getBytes("US-ASCII"); out ++= Crlf
    (headers.filterNot(_._1.equalsIgnoreCase("Content-Length")) :+
      ("Content-Length" -> block.length.toString)).foreach { case (k, v) =>
      out ++= s"$k: $v".getBytes("UTF-8"); out ++= Crlf
    }
    out ++= Crlf
    out ++= block
    out ++= Crlf; out ++= Crlf
    out.toArray
  }

  /** A whole shard: a leading warcinfo record (the conventional file
    * header real crawls carry) followed by the given records.
    */
  def encodeShard(info: Seq[(String, String)],
      records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val head = encodeRecord(
      ("WARC-Type" -> "warcinfo") +: info,
      "software: graft\r\n".getBytes("UTF-8"))
    (head +: records.map { case (h, b) => encodeRecord(h, b) })
      .iterator.flatten.toArray
  }

  /** Parse every record of a WARC shard. Framing is strictly by
    * Content-Length; loud on a bad version line, a missing length,
    * truncation, or a malformed record separator.
    */
  def decode(warc: Array[Byte]): Seq[Record] = {
    val out = ArrayBuffer.empty[Record]
    var p = 0
    def line(): String = {
      val start = p
      while (p + 1 < warc.length && !(warc(p) == '\r' && warc(p + 1) == '\n'))
        p += 1
      require(p + 1 < warc.length, "warc: truncated header line")
      val s = new String(warc, start, p - start, "UTF-8")
      p += 2
      s
    }
    while (p < warc.length) {
      val version = line()
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"warc: bad version line '$version'")
      val headers = ArrayBuffer.empty[(String, String)]
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        require(i > 0, s"warc: malformed header '$h'")
        headers += ((h.substring(0, i).trim, h.substring(i + 1).trim))
        h = line()
      }
      val len = headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Content-Length") => v.toInt
      }.getOrElse(throw new IllegalArgumentException(
        "warc: record without Content-Length"))
      require(warc.length - p >= len + 4, "warc: truncated record block")
      val block = java.util.Arrays.copyOfRange(warc, p, p + len)
      p += len
      require(warc(p) == '\r' && warc(p + 1) == '\n' &&
        warc(p + 2) == '\r' && warc(p + 3) == '\n',
        "warc: record not terminated by CRLF CRLF")
      p += 4
      out += Record(headers.toSeq, block)
    }
    out.toSeq
  }
}
