package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.ops.{Gzip, Tar, Warc, Zip}
import graft.util.Det._

/** Archive-container ingestion (SURVEY.md §2.40) — ZIP, multi-member
  * GZIP, ustar TAR, and WARC, the four container formats web-scale
  * corpora actually arrive in (Common Crawl = WARC/WET in per-record
  * gzip members; dataset dumps = zip/tar shards). The reference scans
  * a directory of LOOSE files (app/main.py:10,139); at 100 TB the
  * corpus ships as archives whose ENTRIES are the documents, and the
  * engine must open them on the EXECUTOR — so every query here builds
  * shards from grouped documents and parses them back entirely inside
  * the scan stage, one shard per task, driver never sees a payload.
  *
  * The round-trip is the oracle lever (the media-codec discipline):
  * each decoded entry reports its byte length and md5, which the
  * DuckDB twin recomputes DIRECTLY from the source table — any byte
  * the container layer drops, duplicates, or corrupts fails the hash.
  * Container-level malformations (CRC mismatch, truncation, framing)
  * are ArchiveSpec's, incl. interop against `java.util.zip`.
  */
object ArchiveQueries {

  /** (doc_id, text-bytes, source, lang) grouped into ~8 shards per
    * source — shard size stays bounded as the corpus grows (more
    * shards, not bigger ones), the property that keeps one-shard-per-
    * task viable at any scale.
    */
  private def shardInput(s: SparkSession, d: String) =
    documentsSpread(s, d)
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        (col("doc_id") % 8).as("shard"))

  private val digestOracle =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Decoded (doc_id, body) pairs → the (doc_id, n_bytes, digest)
    * readout shared by the zip/tar/gzip arms.
    */
  private def digestReadout(s: SparkSession,
      pairs: org.apache.spark.sql.Dataset[(Long, Array[Byte])]): DataFrame =
    pairs.toDF("doc_id", "body")
      .select(col("doc_id"), lng(length(col("body"))).as("n_bytes"),
        md5(col("body")).as("digest"))
      .orderBy("doc_id")

  private val zipScan = QueryDef(
    "q_zip_scan",
    "ZIP-archive ingestion: documents grouped into per-(source, " +
      "doc_id%8) shards, each written as a real ZIP (central " +
      "directory + EOCD, stored/deflate mix, per-entry CRC-32) and " +
      "parsed back central-directory-first with CRC verification — " +
      "all inside one mapGroups/flatMap pass on the executor; per " +
      "entry the byte length and md5, which the oracle recomputes " +
      "from the source table, so any byte the container drops or " +
      "corrupts fails the hash.",
    Some(digestOracle),
    (s, d) => {
      import s.implicits._
      val pairs = shardInput(s, d)
        .select(col("source"), col("shard"), col("doc_id"), col("text"))
        .as[(String, Long, Long, String)]
        .groupByKey { case (src, sh, _, _) => (src, sh) }
        .mapGroups { (_: (String, Long), it: Iterator[(String, Long, Long, String)]) =>
          Zip.encode(it.toSeq.sortBy(_._3).map { case (_, _, id, tx) =>
            (s"$id.txt", tx.getBytes("UTF-8"))
          }, comment = "graft shard")
        }
        .flatMap(zip => Zip.decode(zip).map { case (name, body) =>
          (name.stripSuffix(".txt").toLong, body)
        })
      digestReadout(s, pairs)
    }
  )

  private val tarScan = QueryDef(
    "q_tar_scan",
    "TAR-archive ingestion (the WebDataset shard shape): documents " +
      "grouped into per-(source, doc_id%8) shards, each written as a " +
      "real ustar archive (octal size fields, header checksums, " +
      "512-byte block padding, zero-block terminator) and parsed back " +
      "with checksum verification — one mapGroups/flatMap pass on the " +
      "executor; per entry the byte length and md5, recomputed by the " +
      "oracle from the source table.",
    Some(digestOracle),
    (s, d) => {
      import s.implicits._
      val pairs = shardInput(s, d)
        .select(col("source"), col("shard"), col("doc_id"), col("text"))
        .as[(String, Long, Long, String)]
        .groupByKey { case (src, sh, _, _) => (src, sh) }
        .mapGroups { (_: (String, Long), it: Iterator[(String, Long, Long, String)]) =>
          Tar.encode(it.toSeq.sortBy(_._3).map { case (_, _, id, tx) =>
            (s"$id.txt", tx.getBytes("UTF-8"))
          })
        }
        .flatMap(tar => Tar.decode(tar).map { case (name, body) =>
          (name.stripSuffix(".txt").toLong, body)
        })
      digestReadout(s, pairs)
    }
  )

  private val gzipScan = QueryDef(
    "q_gzip_scan",
    "Multi-member GZIP ingestion (the Common-Crawl WET shard layout: " +
      "one gzip member PER RECORD, concatenated — what makes a shard " +
      "splittable): documents grouped into per-(source, doc_id%8) " +
      "shards, each document its own RFC-1952 member (FNAME header = " +
      "doc id) with CRC-32 + ISIZE verified on decode; a reader that " +
      "stopped at the first member's trailer (the classic bug) would " +
      "drop every row the oracle expects; per member the byte length " +
      "and md5, recomputed by the oracle from the source table.",
    Some(digestOracle),
    (s, d) => {
      import s.implicits._
      val pairs = shardInput(s, d)
        .select(col("source"), col("shard"), col("doc_id"), col("text"))
        .as[(String, Long, Long, String)]
        .groupByKey { case (src, sh, _, _) => (src, sh) }
        .mapGroups { (_: (String, Long), it: Iterator[(String, Long, Long, String)]) =>
          Gzip.encodeMembers(it.toSeq.sortBy(_._3).map { case (_, _, id, tx) =>
            (Some(id.toString): Option[String], tx.getBytes("UTF-8"))
          })
        }
        .flatMap(gz => Gzip.decode(gz).map { case (name, body) =>
          (name.get.toLong, body)
        })
      digestReadout(s, pairs)
    }
  )

  private val warcScan = QueryDef(
    "q_warc_scan",
    "WARC/1.0 ingestion (ISO 28500 — the Common Crawl format): " +
      "documents grouped into per-(source, doc_id%8) shards, each a " +
      "real WARC file opening with a warcinfo record (which the " +
      "consumer must SKIP, not choke on) followed by one response " +
      "record per document with Content-Length framing; the parser is " +
      "strictly length-framed, so blocks containing 'WARC/1.0' or " +
      "blank lines cannot break it (spec-pinned). Per record: doc id " +
      "and host parsed from WARC-Target-URI, the language from " +
      "WARC-Identified-Content-Language (the WET convention), block " +
      "byte length and md5 — all recomputed by the oracle from the " +
      "source table.",
    Some("""SELECT doc_id, lang, source AS host,
           |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |       md5(text) AS digest
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => {
      import s.implicits._
      val recs = shardInput(s, d)
        .select(col("source"), col("shard"), col("doc_id"), col("lang"),
          col("text"))
        .as[(String, Long, Long, String, String)]
        .groupByKey { case (src, sh, _, _, _) => (src, sh) }
        .mapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, String, String)]) =>
          val (src, sh) = key
          Warc.encodeShard(
            Seq("WARC-Filename" -> s"$src-$sh.warc"),
            it.toSeq.sortBy(_._3).map { case (_, _, id, lg, tx) =>
              (Seq(
                "WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:doc-$id>",
                "WARC-Target-URI" -> s"http://$src/docs/$id",
                "WARC-Identified-Content-Language" -> lg,
                "Content-Type" -> "text/plain"),
                tx.getBytes("UTF-8"))
            })
        }
        .flatMap { shard =>
          Warc.decode(shard)
            .filter(_.header("WARC-Type").contains("response"))
            .map { r =>
              val uri = r.header("warc-target-uri").get // case-insensitive
              val host = uri.stripPrefix("http://").takeWhile(_ != '/')
              (uri.substring(uri.lastIndexOf('/') + 1).toLong,
                r.header("WARC-Identified-Content-Language").get,
                host, r.block)
            }
        }
        .toDF("doc_id", "lang", "host", "body")
      recs.select(col("doc_id"), col("lang"), col("host"),
        lng(length(col("body"))).as("n_bytes"), md5(col("body")).as("digest"))
        .orderBy("doc_id")
    }
  )

  private val warcGzScan = QueryDef(
    "q_warc_gz",
    "Per-record-gzip WARC ingestion (.warc.gz — the EXACT container " +
      "Common Crawl publishes, VERDICT r15 #2: one RFC-1952 gzip " +
      "member PER WARC RECORD, members concatenated; that is what " +
      "makes a 1 GiB crawl shard seekable/splittable without a format " +
      "index): each shard opens with a gzipped warcinfo record " +
      "(consumers must skip it, not choke) followed by one gzipped " +
      "response record per document. Decode composes the two layers " +
      "the engine already proves separately — the gzip member splitter " +
      "(CRC-32 + ISIZE verified per member; a reader that stops at the " +
      "first trailer drops the shard) and the length-framed WARC " +
      "parser applied PER MEMBER. Record-count conservation (members " +
      "== warcinfo + documents) is spec-pinned; per record the doc id " +
      "+ host from WARC-Target-URI, the WET-convention language " +
      "header, block byte length and md5 — all recomputed by the " +
      "oracle from the source table, so a byte lost in either layer " +
      "fails the hash.",
    Some("""SELECT doc_id, lang, source AS host,
           |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |       md5(text) AS digest
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => {
      import s.implicits._
      val recs = shardInput(s, d)
        .select(col("source"), col("shard"), col("doc_id"), col("lang"),
          col("text"))
        .as[(String, Long, Long, String, String)]
        .groupByKey { case (src, sh, _, _, _) => (src, sh) }
        .mapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, String, String)]) =>
          val (src, sh) = key
          val info = Warc.encodeRecord(
            Seq("WARC-Type" -> "warcinfo",
              "WARC-Filename" -> s"$src-$sh.warc.gz"),
            "software: graft\r\n".getBytes("UTF-8"))
          val bodies = it.toSeq.sortBy(_._3).map { case (_, _, id, lg, tx) =>
            Warc.encodeRecord(Seq(
              "WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:graft:doc-$id>",
              "WARC-Target-URI" -> s"http://$src/docs/$id",
              "WARC-Identified-Content-Language" -> lg,
              "Content-Type" -> "text/plain"),
              tx.getBytes("UTF-8"))
          }
          // one gzip member PER RECORD, concatenated — .warc.gz
          (info +: bodies).iterator
            .flatMap(r => Gzip.encodeMember(r)).toArray
        }
        .flatMap { shard =>
          Gzip.decode(shard) // member split, CRC-32 + ISIZE verified
            .iterator
            .flatMap { case (_, member) => Warc.decode(member) }
            .filter(_.header("WARC-Type").contains("response"))
            .map { r =>
              val uri = r.header("warc-target-uri").get // case-insensitive
              val host = uri.stripPrefix("http://").takeWhile(_ != '/')
              (uri.substring(uri.lastIndexOf('/') + 1).toLong,
                r.header("WARC-Identified-Content-Language").get,
                host, r.block)
            }
        }
        .toDF("doc_id", "lang", "host", "body")
      recs.select(col("doc_id"), col("lang"), col("host"),
        lng(length(col("body"))).as("n_bytes"), md5(col("body")).as("digest"))
        .orderBy("doc_id")
    }
  )

  val defs: Seq[QueryDef] = Seq(zipScan, tarScan, gzipScan, warcScan,
    warcGzScan)
}
