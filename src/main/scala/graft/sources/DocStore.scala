package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.util.concurrent.atomic.LongAdder

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `docstore` — a DataSource V2 columnar file source (SURVEY.md §2.1).
  *
  * The reference's corpus lives in ad-hoc files re-read wholesale on
  * every process start (rag_chatbot/main.py:8-28). At 100 TB a corpus
  * store must let the engine read *less*: prune columns it doesn't
  * need, skip whole blocks whose stats exclude the predicate, and plan
  * one task per file so a 1000-executor cluster scans in parallel.
  * This source demonstrates all three through Spark's native connector
  * API, so Catalyst drives the pruning — `.explain` shows the pushed
  * filters and the pruned read schema on the scan node.
  *
  * On-disk layout (one `.gds` file per write task):
  * {{{
  * "GDS2" | int schemaLen | schema DDL (utf8)
  * repeat per block (<=512 rows):
  *   int rowCount | per column: byte statsTag (0 none / 1 long /
  *   2 double / 3 string-prefix: unsigned min/max of the packed
  *   8-byte UTF-8 prefix), [8-byte raw min, 8-byte raw max],
  *   int colByteLen
  *   then column chunks in schema order:
  *     null bitmap (ceil(rows/8) bytes, row-major, bit set = null)
  *     values for non-null rows (long/double 8B BE, boolean 1B,
  *     string: int len + utf8)
  * }}}
  *
  * Read path: `ScanBuilder` implements `SupportsPushDownRequiredColumns`
  * (unrequested column chunks are `skipBytes`'d, never decoded) and
  * `SupportsPushDownFilters` (comparison/null/`In` filters on
  * long/double/string/boolean columns are fully evaluated in the
  * reader — block-level via min/max stats, then row-level — and
  * reported as pushed, so Spark plans no residual Filter node).
  * `SupportsReportStatistics` reports byte size so a cluster planner
  * can make broadcast decisions against this source.
  *
  * Write path: a real executor-side `BatchWrite` — each task streams
  * its partition to a uniquely named `.tmp` file and renames on task
  * commit (rename-visible commit protocol; a failed task's temp file is
  * deleted on abort and never becomes visible).
  *
  * Snapshot isolation: every job commit publishes an atomic
  * `_manifest-vN` listing the snapshot's data files; reads plan from
  * ONE manifest (latest, or the `snapshotVersion` read option), so a
  * reader of version N is untouched by version N+1 committing under
  * it. Truncate defers physical deletion to [[DocStore.vacuum]].
  *
  * Supported column types: BIGINT, DOUBLE, STRING, BOOLEAN.
  */
object DocStore {
  val Magic: Int = 0x47445331 // "GDS1" — blocks carry tag-0/1/2 stats only
  // "GDS2" — adds tag-3 string block stats (r15). The format byte is
  // bumped BECAUSE of that tag (ADVICE r15): a GDS1-era reader takes
  // its `case _` stats arm without consuming tag-3's 16 min/max bytes
  // and desyncs the stream — corrupting reads instead of degrading.
  // Bumping the magic turns that misparse into a loud "not a GDS file".
  // This reader accepts both magics and handles tag-3 under either
  // (tag-3 briefly shipped under GDS1; those files remain readable) —
  // the bump protects pre-tag-3 readers from NEW files.
  val Magic2: Int = 0x47445332
  val BlockRows: Int = 512

  private[graft] def requireMagic(m: Int, file: String): Unit =
    require(m == Magic || m == Magic2,
      s"not a GDS file (or a newer format revision): $file")

  /** Local-mode test instrumentation only (executors share the JVM in
    * tests): block-skip effectiveness counters for DocStoreSpec. On a
    * real cluster these would be per-executor and surface through the
    * DSv2 custom-metric API instead.
    */
  val blocksRead = new LongAdder
  val blocksSkipped = new LongAdder

  /** Local-mode test seam for the optimistic-concurrency commit path
    * (r15): if set, [[DocStoreBatchWrite.commit]] consumes it (fetch-
    * and-clear, so a competing commit run INSIDE the hook doesn't
    * recurse) and runs it once, after this job's data files are
    * visible but before its first manifest CAS attempt — the widest
    * race window. Tests inject a full competing commit here to
    * deterministically exercise the CAS-failure → conflict-check →
    * rebase-retry (or loud-abort) path that wall-clock races only hit
    * probabilistically.
    */
  @volatile private[graft] var commitRaceHook: Option[() => Unit] = None

  private[sources] def supportedType(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | StringType | BooleanType => true
    case _ => false
  }

  /** Filters this source evaluates exactly (block stats + row eval). */
  private[sources] def canHandle(f: Filter): Boolean = f match {
    case EqualTo(_, v) => v != null
    case GreaterThan(_, v) => v != null
    case GreaterThanOrEqual(_, v) => v != null
    case LessThan(_, v) => v != null
    case LessThanOrEqual(_, v) => v != null
    case In(_, vs) => vs != null && vs.forall(_ != null)
    case IsNotNull(_) | IsNull(_) => true
    case _ => false
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case _ => throw new IllegalArgumentException(
      s"docstore: incomparable filter value ${a.getClass}/${b.getClass}")
  }

  /** Row-level filter evaluation on the decoded (JVM-typed) value. */
  private[sources] def rowMatches(f: Filter, v: Any): Boolean = f match {
    case IsNull(_) => v == null
    case IsNotNull(_) => v != null
    case _ if v == null => false
    case EqualTo(_, x) => cmp(v, x) == 0
    case GreaterThan(_, x) => cmp(v, x) > 0
    case GreaterThanOrEqual(_, x) => cmp(v, x) >= 0
    case LessThan(_, x) => cmp(v, x) < 0
    case LessThanOrEqual(_, x) => cmp(v, x) <= 0
    case In(_, xs) => xs.exists(x => cmp(v, x) == 0)
    case _ => true
  }

  /** Block-level pruning: can ANY row in [min, max] satisfy `f`?
    * Stats cover non-null values only, so null-sensitive filters
    * (IsNull) never prune on stats.
    */
  private[sources] def blockMayMatch(f: Filter, min: Any, max: Any): Boolean =
    f match {
      case EqualTo(_, x) => cmp(x, min) >= 0 && cmp(x, max) <= 0
      case GreaterThan(_, x) => cmp(max, x) > 0
      case GreaterThanOrEqual(_, x) => cmp(max, x) >= 0
      case LessThan(_, x) => cmp(min, x) < 0
      case LessThanOrEqual(_, x) => cmp(min, x) <= 0
      case In(_, xs) => xs.exists(x => cmp(x, min) >= 0 && cmp(x, max) <= 0)
      case _ => true
    }

  // ---------------------------------------- string block stats (r15)
  //
  // String columns carry tag-3 stats: the unsigned min/max of each
  // value's PACKED 8-BYTE UTF-8 PREFIX (zero-padded, big-endian in one
  // long). Pruning uses ONLY prefix-to-prefix comparisons, so it is
  // sound with zero assumptions about string collation: a probe prefix
  // outside the block's [minP, maxP] prefix range cannot equal any
  // row's prefix, hence the probe cannot equal any row. That limits
  // stat pruning to the EQUALITY-SHAPED filters (EqualTo / In) — which
  // are exactly the corpus-slicing predicates (lang = 'de',
  // source = 'cc') a 100 TB scan lives on; range predicates on strings
  // never prune (blockMayMatchString returns true), they still
  // row-filter exactly.

  /** Big-endian packed first-8-UTF-8-bytes of `s`, zero-padded. */
  private[graft] def packPrefix(s: String): Long = {
    val b = s.getBytes("UTF-8")
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v
  }

  /** Tag-3 pruning: can any row whose packed prefix lies in
    * [minP, maxP] satisfy `f`? Unsigned compares throughout.
    */
  private[sources] def blockMayMatchString(f: Filter, minP: Long,
      maxP: Long): Boolean = {
    def in(x: Any): Boolean = x match {
      case s: String =>
        val p = packPrefix(s)
        java.lang.Long.compareUnsigned(p, minP) >= 0 &&
          java.lang.Long.compareUnsigned(p, maxP) <= 0
      case _ => true
    }
    f match {
      case EqualTo(_, x) => in(x)
      case In(_, xs) => xs.exists(in)
      case _ => true
    }
  }

  // ------------------------------- per-file Bloom filters (r16)
  //
  // min/max and tag-3 prefix stats cannot prune HIGH-CARDINALITY
  // equality probes (a doc_id point lookup — the CDC / GDPR-takedown
  // access pattern: every file's id range covers every probe). A
  // writer that declares `bloomCols` gets a per-(file, column) k-hash
  // Bloom filter recorded in the MANIFEST (`#bloom` header), so the
  // scan PLANNER drops whole files the probe value cannot be in —
  // driver-side, zero file opens, the Iceberg/Delta bloom-index shape.
  // 1 KiB of bits x 6 hashes ≈ 0.9% fpp at ~1k distinct values per
  // file; false positives only cost a scan, false negatives are
  // impossible (the spec brute-forces that).

  val BloomBits: Int = 8192 // bits per (file, column) — 1 KiB
  val BloomHashes: Int = 6

  /** Canonical probe/value bytes per column type — the SAME encoding
    * on the write and probe sides, with probe values normalized
    * through the column's type (a Long probe against a LongType column
    * may arrive as any Number). None = unprunable probe (type
    * mismatch): treat as may-contain.
    */
  private[graft] def bloomBytes(dt: DataType, v: Any): Option[Array[Byte]] =
    (dt, v) match {
      case (LongType, n: Number) =>
        Some(java.nio.ByteBuffer.allocate(8).putLong(n.longValue()).array())
      case (DoubleType, n: Number) =>
        Some(java.nio.ByteBuffer.allocate(8).putDouble(n.doubleValue()).array())
      case (BooleanType, b: Boolean) =>
        Some(Array[Byte](if (b) 1 else 0))
      case (StringType, s: String) => Some(s.getBytes("UTF-8"))
      case _ => None
    }

  /** Kirsch–Mitzenmacher double hashing: probe i hits bit
    * (h1 + i·h2) mod m, h1/h2 = murmur3 under two seeds — computed
    * ONCE per value (this runs per row on the write path).
    */
  private def bloomBit(h1: Int, h2: Int, i: Int): Int =
    (((h1.toLong + i.toLong * h2.toLong) % BloomBits + BloomBits) % BloomBits)
      .toInt

  private[graft] def bloomAdd(bits: Array[Long], bytes: Array[Byte]): Unit = {
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x2f0e1d3c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x6b79a355)
    var i = 0
    while (i < BloomHashes) {
      val b = bloomBit(h1, h2, i)
      bits(b >> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  private[graft] def bloomMayContain(bits: Array[Long],
      bytes: Array[Byte]): Boolean = {
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x2f0e1d3c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x6b79a355)
    var i = 0
    while (i < BloomHashes) {
      val b = bloomBit(h1, h2, i)
      if ((bits(b >> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  private[graft] def bloomEncode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private[graft] def bloomDecode(b64: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(b64))
    Array.fill(bb.remaining() / 8)(bb.getLong())
  }

  /** (file name, column) → encoded Bloom bits of snapshot `v`, from
    * the manifest's `#bloom` header lines.
    */
  private[graft] def readBloomMap(dir: String,
      v: Long): Map[(String, String), String] = readSnapshot(dir, v).blooms

  /** Planner-side test instrumentation: files dropped by Bloom pruning
    * (local-mode analogue of a DSv2 custom metric, like blocksSkipped).
    */
  val filesBloomSkipped = new LongAdder

  private[sources] def filterColumn(f: Filter): Option[String] = f match {
    case EqualTo(c, _) => Some(c)
    case GreaterThan(c, _) => Some(c)
    case GreaterThanOrEqual(c, _) => Some(c)
    case LessThan(c, _) => Some(c)
    case LessThanOrEqual(c, _) => Some(c)
    case In(c, _) => Some(c)
    case IsNotNull(c) => Some(c)
    case IsNull(c) => Some(c)
    case _ => None
  }

  private[graft] def listDataFiles(dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".gds"))
      .sortBy(_.getPath.getName)
      .map(s => (s.getPath.toString, s.getLen))
  }

  // ------------------------------------------------- snapshot manifests
  //
  // Iceberg/Delta-style snapshot isolation (VERDICT r12 #6): every
  // successful job commit publishes `_manifest-v%08d`, an atomic
  // (write-tmp + rename) text file listing the snapshot's data files.
  // Reads resolve ONE manifest (the latest, or an explicit
  // `snapshotVersion` read option) and plan exactly its files, so a
  // reader sees version N in full while version N+1 commits — data
  // files are immutable once visible and truncate no longer deletes
  // them (orphans are reclaimed by an explicit [[vacuum]], the
  // lakehouse contract). Directories with no manifest (pre-versioning
  // layouts) fall back to directory listing and are adopted into the
  // manifest chain by their next write.

  val ManifestPrefix = "_manifest-v"

  private def fsFor(dir: String): FileSystem =
    new Path(dir).getFileSystem(new Configuration())

  private def manifestName(v: Long): String = f"$ManifestPrefix$v%08d"

  private[graft] def manifestVersions(dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = fsFor(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(ManifestPrefix) && !n.contains(".tmp"))
      .flatMap(n =>
        scala.util.Try(n.stripPrefix(ManifestPrefix).toLong).toOption)
      .sorted
  }

  private[graft] def latestVersion(dir: String): Option[Long] =
    manifestVersions(dir).lastOption

  private def manifestBody(dir: String, v: Long): String = {
    val fs = fsFor(dir)
    val mp = new Path(dir, manifestName(v))
    require(fs.exists(mp), s"docstore: no snapshot version $v under $dir")
    val in = fs.open(mp)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Everything one manifest carries, parsed in ONE body read (r16):
    * the commit loop and the scan planner consult files + DV bindings
    * + Bloom indexes + key domain + schema together, and a manifest at
    * 100 TB is file-count-sized (MBs) — re-reading it once per header
    * kind multiplied per commit ATTEMPT is real I/O. The single-header
    * readers below stay as thin wrappers for call sites that need one
    * thing.
    */
  private[graft] final case class Snapshot(
      version: Long,
      files: Seq[(String, Long)],
      dvs: Map[String, String],
      blooms: Map[(String, String), String],
      keyDomain: Option[(String, Long, Long)],
      schemaDdl: Option[String])

  private[graft] def readSnapshot(dir: String, v: Long): Snapshot = {
    val files = Seq.newBuilder[(String, Long)]
    val dvs = Map.newBuilder[String, String]
    val blooms = Map.newBuilder[(String, String), String]
    var kd: Option[(String, Long, Long)] = None
    var schema: Option[String] = None
    manifestBody(dir, v).linesIterator.foreach { l =>
      if (l.isEmpty) ()
      else if (l.startsWith("#dv\t")) {
        val a = l.split('\t'); dvs += ((a(1), a(2)))
      } else if (l.startsWith("#bloom\t")) {
        val a = l.split('\t'); blooms += (((a(1), a(2)), a(3)))
      } else if (l.startsWith("#keydomain\t")) {
        val a = l.split('\t'); kd = Some((a(1), a(2).toLong, a(3).toLong))
      } else if (l.startsWith("#schema\t")) {
        schema = Some(l.stripPrefix("#schema\t"))
      } else if (!l.startsWith("#")) {
        val Array(name, len) = l.split('\t')
        files += ((new Path(dir, name).toString, len.toLong))
      }
    }
    Snapshot(v, files.result(), dvs.result(), blooms.result(), kd, schema)
  }

  /** Data files of snapshot `v`: absolute path + byte length.
    * `#`-prefixed header lines (commit metadata, e.g. `#ts`) are
    * skipped — and were already skipped by every reader version that
    * shipped, so old manifests (no header) and new ones interread.
    */
  private[graft] def readManifest(dir: String, v: Long): Seq[(String, Long)] =
    readSnapshot(dir, v).files

  /** Commit timestamp of snapshot `v` in epoch millis: the embedded
    * `#ts` manifest header when present, else (legacy manifests
    * written before r15) the manifest file's modification time — the
    * same fallback Delta uses for commits without ICT.
    */
  private[graft] def commitTimestamp(dir: String, v: Long): Long =
    manifestBody(dir, v).linesIterator
      .find(_.startsWith("#ts\t"))
      .map(_.stripPrefix("#ts\t").trim.toLong)
      .getOrElse(
        fsFor(dir).getFileStatus(new Path(dir, manifestName(v)))
          .getModificationTime)

  /** Time travel: the snapshot a reader at `tsMillis` resolves — the
    * LATEST version whose commit timestamp is ≤ the asked-for instant
    * (Delta/Iceberg `timestampAsOf` semantics). Loud failure when the
    * instant predates the first commit: there is no table state to
    * serve, and silently serving the first snapshot would misreport
    * history.
    */
  private[graft] def versionForTimestamp(dir: String, tsMillis: Long): Long = {
    val vs = manifestVersions(dir)
    require(vs.nonEmpty, s"docstore: no snapshots under $dir")
    val eligible = vs.filter(v => commitTimestamp(dir, v) <= tsMillis)
    require(eligible.nonEmpty,
      s"docstore: no snapshot at or before timestamp $tsMillis under " +
        s"$dir (first commit is at ${commitTimestamp(dir, vs.head)})")
    eligible.max
  }

  /** Atomically publish manifest `v` — the version-CAS primitive of
    * the optimistic-concurrency commit: returns false if that version
    * already exists (a concurrent writer won the race), in which case
    * [[DocStoreBatchWrite.commit]] REBASES onto the winner's snapshot,
    * re-checks logical conflicts, and retries with the next number.
    * The exists-check + tmp-write + rename is atomic on any FS with
    * atomic rename (HDFS, local POSIX); an object store without it
    * would swap this for a conditional PUT, same contract.
    */
  private[graft] def writeManifest(dir: String, v: Long,
      files: Seq[(String, Long)],
      commitTs: Long = System.currentTimeMillis(),
      dvs: Map[String, String] = Map.empty,
      keyDomain: Option[(String, Long, Long)] = None,
      blooms: Map[(String, String), String] = Map.empty,
      schemaDdl: Option[String] = None): Boolean = {
    val fs = fsFor(dir)
    val fin = new Path(dir, manifestName(v))
    if (fs.exists(fin)) return false
    val tmp = new Path(dir,
      s"${manifestName(v)}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try {
      // `#ts` header = in-commit timestamp (Delta's ICT shape): time
      // travel by timestamp must not depend on FS mtimes surviving
      // copies/restores. Readers predating the header already skip
      // `#` lines. `#dv` headers bind deletion vectors (r15) — only
      // for files this manifest actually lists. `#keydomain` records
      // the logical key range a MERGE read-modified, for successor
      // commits' serializability check (r16)
      val names = files.map { case (f, _) => new Path(f).getName }.toSet
      val dvLines = dvs.toSeq.filter { case (n, _) => names.contains(n) }
        .sortBy(_._1).map { case (n, dv) => s"#dv\t$n\t$dv" }
      val kdLines = keyDomain.toSeq.map { case (c, mn, mx) =>
        s"#keydomain\t$c\t$mn\t$mx"
      }
      val bloomLines = blooms.toSeq
        .filter { case ((n, _), _) => names.contains(n) }
        .sortBy { case ((n, c), _) => (n, c) }
        .map { case ((n, c), b64) => s"#bloom\t$n\t$c\t$b64" }
      // `#schema` (r16): the committing writer's schema, so a table
      // whose every row was deleted (EMPTY file list — zero-row tasks
      // publish nothing) still infers its schema on read
      val schemaLines = schemaDdl.toSeq.map(ddl => s"#schema\t$ddl")
      val body = (s"#ts\t$commitTs" +:
        (schemaLines ++ kdLines ++ dvLines ++ bloomLines)) ++
        files.map { case (f, len) => s"${new Path(f).getName}\t$len" }
      out.write(body.mkString("", "\n", "\n").getBytes("UTF-8"))
    } finally out.close()
    if (fs.rename(tmp, fin)) true
    else { fs.delete(tmp, false); false }
  }

  /** The file set a scan plans: an explicitly requested snapshot, else
    * the latest manifest, else (legacy, pre-manifest dir) the listing.
    */
  private[graft] def snapshotFiles(dir: String,
      requested: Option[Long]): Seq[(String, Long)] =
    requested match {
      case Some(v) => readManifest(dir, v)
      case None => latestVersion(dir) match {
        case Some(v) => readManifest(dir, v)
        case None    => listDataFiles(dir)
      }
    }

  // ---------------------------------------------- deletion vectors (r15)
  //
  // Merge-on-read DELETE (the Delta deletion-vector / Iceberg v2
  // positional-delete shape): instead of rewriting a data file to drop
  // rows, a commit publishes a SIDECAR file of deleted row ordinals
  // (0-based position within the data file, counting every row in
  // block order) and binds it in the manifest via a `#dv` header line
  // `#dv\t<dataFileName>\t<dvFileName>`. Readers subtract the mask at
  // scan time; the data file is untouched. Because `#`-headers are
  // skipped by every manifest parser that ever shipped, DV commits are
  // fully back-compatible: an old reader sees the same file list (and
  // would see deleted rows — which is why the STREAM source treats a
  // dv change as a non-append commit and fails loudly).
  //
  // Sidecar format: DvMagic, count (int), then `count` longs sorted
  // ascending. At fixture scale the mask loads as a long[] + binary
  // search; a production store would swap in a roaring bitmap behind
  // the same two functions.

  val DvMagic = 0x47445644 // "GDVD"

  private[graft] def writeDv(dir: String, name: String,
      ordinals: Array[Long]): Unit = {
    val fs = fsFor(dir)
    // overwrite=true makes executor-side sidecar writes IDEMPOTENT
    // (ADVICE r15): the name is deterministic per (file, job token) and
    // the content deterministic per name, so a task retry or
    // speculative duplicate rewrites identical bytes instead of failing
    // the job with FileAlreadyExists; orphans of failed jobs are
    // reclaimed by vacuum like any unreferenced sidecar
    val out = new java.io.DataOutputStream(
      fs.create(new Path(dir, name), true))
    try {
      out.writeInt(DvMagic)
      out.writeInt(ordinals.length)
      ordinals.foreach(out.writeLong)
    } finally out.close()
  }

  private[graft] def readDv(path: String): Array[Long] = {
    val p = new Path(path)
    val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
    try {
      require(in.readInt() == DvMagic, s"not a deletion vector: $path")
      val n = in.readInt()
      Array.fill(n)(in.readLong())
    } finally in.close()
  }

  /** Deleted-row count from the sidecar header alone — O(1), the read
    * metadata-only COUNT pushdown needs under merge-on-read deletes.
    */
  private[graft] def dvCountOf(path: String): Long = {
    val p = new Path(path)
    val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
    try {
      require(in.readInt() == DvMagic, s"not a deletion vector: $path")
      in.readInt().toLong
    } finally in.close()
  }

  /** The committing writer's schema DDL of snapshot `v` (`#schema`
    * header), when recorded. The authoritative table schema is still
    * the by-name union of LIVE file schemas; this header only serves
    * reads of an EMPTY snapshot (every row deleted) and carries
    * forward through metadata-only commits.
    */
  private[graft] def readSchemaHeader(dir: String, v: Long): Option[String] =
    readSnapshot(dir, v).schemaDdl

  /** The logical key domain commit `v` declared (`#keydomain` header):
    * (column, min, max) of the keys a MERGE read-modified. None for
    * commits that declared none (appends, compaction, pre-r16).
    */
  private[graft] def readKeyDomain(dir: String,
      v: Long): Option[(String, Long, Long)] = readSnapshot(dir, v).keyDomain

  /** Data-file name → deletion-vector file name bindings of snapshot
    * `v`, from the manifest's `#dv` header lines. Empty for pre-DV
    * manifests.
    */
  private[graft] def readDvMap(dir: String, v: Long): Map[String, String] =
    readSnapshot(dir, v).dvs

  /** The DV bindings a scan applies: requested snapshot, else latest,
    * else (legacy dir) none.
    */
  private[graft] def snapshotDvs(dir: String,
      requested: Option[Long]): Map[String, String] =
    requested.orElse(latestVersion(dir)) match {
      case Some(v) => readDvMap(dir, v)
      case None    => Map.empty
    }

  /** Reclaim storage: delete data files not referenced by any RETAINED
    * manifest and drop the manifests older than the retention window —
    * the last `retainLast` versions (default 1 = latest only, the
    * pre-r16 behavior).
    *
    * RETENTION GUARD (VERDICT r15 #6): a pinned time-travel reader and
    * a concurrent vacuum race at 100 TB — without a window, vacuum
    * reclaims a file the pinned read still resolves, a read-after-free
    * that surfaces as task IO errors mid-scan. The contract:
    *
    *   - WITHIN retention, pinned reads never lose files: every file
    *     (and DV sidecar) referenced by ANY retained manifest survives,
    *     so `retainLast` bounds how old a version readers may pin —
    *     exactly Delta's `delta.deletedFileRetentionDuration` trade,
    *     expressed in versions (this store's commit clock).
    *   - PAST retention, reads fail LOUDLY at planning time (the
    *     manifest itself is gone → "no snapshot version v"), never as
    *     an empty or partial result.
    */
  def vacuum(dir: String, retainLast: Int = 1): Unit = {
    require(retainLast >= 1, "vacuum must retain at least the latest version")
    latestVersion(dir).foreach { v =>
      val fs = fsFor(dir)
      val floor = v - (retainLast - 1)
      val retained = manifestVersions(dir).filter(_ >= floor)
      val live = retained.flatMap(readManifest(dir, _)).map { case (f, _) =>
        new Path(f).getName
      }.toSet
      listDataFiles(dir).foreach { case (f, _) =>
        val p = new Path(f)
        if (!live.contains(p.getName)) fs.delete(p, false)
      }
      // deletion-vector sidecars: keep the ones ANY retained manifest
      // binds; superseded vectors (re-deletes, materialized files) go
      val liveDvs = retained.flatMap(readDvMap(dir, _).values).toSet
      fs.listStatus(new Path(dir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.contains(".gds.dv"))
        .foreach { s =>
          if (!liveDvs.contains(s.getPath.getName)) fs.delete(s.getPath, false)
        }
      manifestVersions(dir).filter(_ < floor).foreach { old =>
        fs.delete(new Path(dir, manifestName(old)), false)
      }
    }
  }

  /** File-level min/max of a column from block headers only — the
    * Iceberg-manifest-style metadata read behind [[DocStoreOps.merge]]'s
    * affected-file pruning: block stats are aggregated without decoding
    * a single column chunk (chunks are `skip`'d wholesale), so the cost
    * is O(blocks), not O(rows). None when no block carries stats for
    * the column (all-null or non-numeric) — callers must treat such a
    * file as unprunable.
    */
  private[graft] def fileColumnStats(file: String,
      column: String): Option[(Any, Any)] = {
    val p = new Path(file)
    val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
    try {
      requireMagic(in.readInt(), file)
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val schema = StructType.fromDDL(new String(bytes, "UTF-8"))
      val ci = schema.fieldNames.indexOf(column)
      // a file written before the column existed (schema evolution)
      // carries no stats for it — unprunable, callers treat it as
      // conservatively affected
      if (ci < 0) return None
      var mn: Any = null
      var mx: Any = null
      var done = false
      while (!done) {
        try in.readInt() // row count (unused for stats)
        catch { case _: EOFException => done = true }
        if (!done) {
          var skip = 0L
          var i = 0
          while (i < schema.length) {
            val tag = in.readByte()
            val stats: (Any, Any) = tag match {
              case 1 => (in.readLong(), in.readLong())
              case 2 => (in.readDouble(), in.readDouble())
              case 3 => in.readLong(); in.readLong(); (null, null)
              case _ => (null, null)
            }
            val bmn = stats._1
            val bmx = stats._2
            if (i == ci && (tag == 1 || tag == 2)) {
              if (mn == null || cmp(bmn, mn) < 0) mn = bmn
              if (mx == null || cmp(bmx, mx) > 0) mx = bmx
            }
            skip += in.readInt()
            i += 1
          }
          var left = skip
          while (left > 0) left -= in.skip(left)
        }
      }
      if (mn == null) None else Some((mn, mx))
    } finally in.close()
  }

  /** Executor-side header-only aggregate of one data file: total row
    * count plus per-column (min, max) folded over block stats — every
    * column chunk is skipped, so the cost is O(blocks). The metadata
    * read behind the aggregate pushdown ([[DocStoreAggScan]]); a
    * column with no stats in any block (all-null, or absent from this
    * file's schema) reports no entry.
    */
  private[graft] def fileHeaderAgg(
      file: String): (Long, Map[String, (Any, Any)]) = {
    val p = new Path(file)
    val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
    try {
      requireMagic(in.readInt(), file)
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val schema = StructType.fromDDL(new String(bytes, "UTF-8"))
      val mn = new Array[Any](schema.length)
      val mx = new Array[Any](schema.length)
      var total = 0L
      var done = false
      while (!done) {
        val rows =
          try in.readInt()
          catch { case _: EOFException => done = true; 0 }
        if (!done) {
          total += rows
          var skip = 0L
          var i = 0
          while (i < schema.length) {
            val tag = in.readByte()
            val stats: (Any, Any) = tag match {
              case 1 => (in.readLong(), in.readLong())
              case 2 => (in.readDouble(), in.readDouble())
              case 3 => in.readLong(); in.readLong(); (null, null)
              case _ => (null, null)
            }
            if (tag == 1 || tag == 2) {
              if (mn(i) == null || cmp(stats._1, mn(i)) < 0) mn(i) = stats._1
              if (mx(i) == null || cmp(stats._2, mx(i)) > 0) mx(i) = stats._2
            }
            skip += in.readInt()
            i += 1
          }
          var left = skip
          while (left > 0) left -= in.skip(left)
        }
      }
      val stats = schema.fieldNames.zipWithIndex.collect {
        case (n, i) if mn(i) != null => n -> ((mn(i), mx(i)))
      }.toMap
      (total, stats)
    } finally in.close()
  }

  /** Executor-side (file-ordinal, key-value) stream of one data file's
    * LONG `keyCol` — the per-file scan behind [[DocStoreOps
    * .deleteVectors]]: ordinals count EVERY row in block order (the
    * same numbering the partition reader's mask uses), null keys keep
    * their ordinal but emit nothing (a null never matches a delete
    * key). Decodes ONLY the key column; other chunks are skipped.
    */
  private[graft] def scanKeyOrdinals(file: String,
      keyCol: String): Array[(Long, Long)] = {
    val p = new Path(file)
    val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
    try {
      requireMagic(in.readInt(), file)
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val schema = StructType.fromDDL(new String(bytes, "UTF-8"))
      val ci = schema.fieldNames.indexOf(keyCol)
      if (ci < 0) return Array.empty // evolved file predating the key
      require(schema.fields(ci).dataType == LongType,
        s"docstore: deletion-vector key $keyCol must be BIGINT")
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var base = 0L
      var done = false
      while (!done) {
        val rows =
          try in.readInt()
          catch { case _: EOFException => done = true; 0 }
        if (!done) {
          val colLen = new Array[Int](schema.length)
          var i = 0
          while (i < schema.length) {
            in.readByte() match {
              case 1 => in.readLong(); in.readLong()
              case 2 => in.readDouble(); in.readDouble()
              case 3 => in.readLong(); in.readLong()
              case _ =>
            }
            colLen(i) = in.readInt()
            i += 1
          }
          i = 0
          while (i < schema.length) {
            if (i == ci) {
              val bitmap = new Array[Byte]((rows + 7) / 8)
              in.readFully(bitmap)
              var r = 0
              while (r < rows) {
                if ((bitmap(r >> 3) & (1 << (r & 7))) == 0)
                  out += ((base + r, in.readLong()))
                r += 1
              }
            } else in.skipBytes(colLen(i))
            i += 1
          }
          base += rows
        }
      }
      out.toArray
    } finally in.close()
  }

  private[sources] def readFileSchema(file: String): StructType = {
    val p = new Path(file)
    val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
    try {
      requireMagic(in.readInt(), file)
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      StructType.fromDDL(new String(bytes, "UTF-8"))
    } finally in.close()
  }
}

/** `spark.read.format("docstore")` / `df.write.format("docstore")`.
  * Registered in META-INF/services; `supportsExternalMetadata` lets
  * Spark hand the incoming DataFrame schema to a fresh-directory write.
  */
class DocStoreDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "docstore"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "docstore: 'path' option is required")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // the table schema is the BY-NAME UNION of the live files' schemas
    // (schema evolution: appending files with added columns widens the
    // table; older files read the new columns as null). Same-name
    // columns must agree on type. Driver cost is one header read per
    // live file — a production variant would persist the merged schema
    // in the manifest the way Delta logs it.
    val dir = path(options)
    val files = DocStore.snapshotFiles(dir, None)
    if (files.isEmpty) {
      // an EMPTY snapshot (every row deleted — zero-row tasks publish
      // no file) still has a schema: the last committing writer's,
      // recorded in the manifest's #schema header (r16)
      val fromHeader = DocStore.latestVersion(dir)
        .flatMap(v => DocStore.readSchemaHeader(dir, v))
      require(fromHeader.isDefined,
        s"docstore: no .gds files under $dir and no schema given")
      return StructType.fromDDL(fromHeader.get)
    }
    val schemas = files.map(f => DocStore.readFileSchema(f._1))
    val merged = schemas.reduceLeft { (acc, s) =>
      s.fields.foldLeft(acc) { (a, f) =>
        a.fields.find(_.name == f.name) match {
          case Some(ex) =>
            require(ex.dataType == f.dataType,
              s"docstore: column ${f.name} has conflicting types " +
                s"${ex.dataType} vs ${f.dataType} across files")
            a
          case None => a.add(f)
        }
      }
    }
    // a column absent from ANY live file reads as null there, so the
    // merged field must be nullable even if every carrying file wrote
    // it non-null — otherwise Catalyst constant-folds `IS NULL` on it
    StructType(merged.fields.map { f =>
      val everywhere = schemas.forall(_.fieldNames.contains(f.name))
      val anyNullable = schemas.exists(_.fields.exists(x =>
        x.name == f.name && x.nullable))
      f.copy(nullable = !everywhere || anyNullable)
    })
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    schema.fields.foreach { f =>
      require(DocStore.supportedType(f.dataType),
        s"docstore: unsupported column type ${f.dataType} for ${f.name}")
    }
    new DocStoreTable(properties.get("path"), schema)
  }
}

class DocStoreTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"docstore($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val byVersion = Option(options.get("snapshotVersion")).map(_.toLong)
    val byTs = Option(options.get("snapshotTimestamp")).map(_.toLong)
    require(byVersion.isEmpty || byTs.isEmpty,
      "docstore: snapshotVersion and snapshotTimestamp are mutually " +
        "exclusive")
    // timestamp resolves to a version HERE (option-parse time) — the
    // other half of the time-travel API (Delta timestampAsOf): the
    // latest commit at or before the instant, loud if none
    val pinned = byVersion.orElse(
      byTs.map(ts => DocStore.versionForTimestamp(dir, ts)))
    new DocStoreScanBuilder(dir, tableSchema, pinned,
      Option(options.get("files"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet),
      options.getBoolean("ignoreChanges", false))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DocStoreWriteBuilder(dir, info.schema(),
      Option(info.options.get("replaceFiles"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty),
      Option(info.options.get("commitTimestamp")).map(_.toLong),
      Option(info.options.get("readVersion")).map(_.toLong),
      Option(info.options.get("keyDomain")).map { s =>
        val a = s.split(',')
        require(a.length == 3, s"docstore: malformed keyDomain '$s' " +
          "(expected col,min,max)")
        (a(0), a(1).toLong, a(2).toLong)
      },
      Option(info.options.get("bloomCols"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty))
}

class DocStoreScanBuilder(dir: String, fullSchema: StructType,
    snapshotVersion: Option[Long],
    fileSubset: Option[Set[String]],
    ignoreChanges: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Seq[DocStoreAggExpr] = Seq.empty

  /** Metadata-only aggregate pushdown (the Iceberg/Delta
    * count-from-manifests shape): ungrouped COUNT(*) / MIN / MAX with
    * no filters are answered from BLOCK HEADERS alone — one partition
    * per file emits a partial row (count from block row counts minus
    * the deletion-vector count; min/max folded from block stats), and
    * Spark's final aggregation combines the partials, so not a single
    * column chunk is decoded. PARTIAL pushdown (not complete): the
    * combine stays in Spark, the scan stays one-task-per-file
    * parallel. MIN/MAX are refused when any deletion vector is live
    * (a masked row could hold the extremum — the mask is positional,
    * stats are not) and for non-primitive-stat columns; COUNT stays
    * valid under masks because sidecar headers carry exact counts.
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty ||
      fileSubset.nonEmpty) return false
    val dvsLive = DocStore.snapshotDvs(dir, snapshotVersion).nonEmpty
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: org.apache.spark.sql.connector.expressions.NamedReference
        if r.fieldNames.length == 1 => Some(r.fieldNames.head)
      case _ => None
    }
    def statCapable(c: String): Boolean =
      fullSchema.fields.find(_.name == c).exists(f =>
        f.dataType == LongType || f.dataType == DoubleType)
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(DocStoreAggExpr("count", ""))
      case m: Min if !dvsLive =>
        colOf(m.column()).filter(statCapable).map(DocStoreAggExpr("min", _))
      case m: Max if !dvsLive =>
        colOf(m.column()).filter(statCapable).map(DocStoreAggExpr("max", _))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) false
    else { pushedAgg = specs.flatten; true }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition { f =>
      DocStore.canHandle(f) && DocStore.filterColumn(f).exists { c =>
        fullSchema.fieldNames.contains(c)
      }
    }
    pushed = ours
    residual // Spark keeps a Filter node for only these
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // the snapshot resolves HERE, when the scan is planned: the file
    // list is pinned before execution, so a commit racing the read
    // cannot hand it a mixed or shrinking file set. The `files` option
    // (a set of file NAMES) restricts the scan to a subset of the
    // snapshot — the seam DocStoreOps.merge/compact use to read only
    // the affected files of a copy-on-write rewrite.
    // ONE manifest read serves files + DV bindings + Bloom indexes
    // (r16): scan planning is driver-side and the manifest is
    // file-count-sized at 100 TB
    val resolved = snapshotVersion.orElse(DocStore.latestVersion(dir))
    val snapOpt = resolved.map(v => DocStore.readSnapshot(dir, v))
    val snap = snapOpt.map(_.files).getOrElse(DocStore.listDataFiles(dir))
    val subset = fileSubset match {
      case Some(names) => snap.filter { case (f, _) =>
        names.contains(new Path(f).getName)
      }
      case None => snap
    }
    // file-level Bloom pruning (r16): equality-shaped pushed filters
    // (EqualTo / In) drop whole files whose manifest Bloom proves the
    // probe value absent — driver-side, zero file opens; a file with
    // no Bloom for the column is never pruned. Sound because every
    // non-null stored value was added to the writer's Bloom and
    // equality never matches null.
    val blooms = snapOpt.map(_.blooms).getOrElse(Map.empty)
    val planned =
      if (blooms.isEmpty || pushed.isEmpty) subset
      else {
        def dtOf(c: String) = fullSchema.fields.find(_.name == c).map(_.dataType)
        def mayMatch(name: String): Boolean = pushed.forall {
          case EqualTo(c, v) if v != null =>
            blooms.get((name, c)).forall { b64 =>
              (for (dt <- dtOf(c); bs <- DocStore.bloomBytes(dt, v))
                yield DocStore.bloomMayContain(DocStore.bloomDecode(b64), bs))
                .getOrElse(true)
            }
          case In(c, vs) if vs != null && vs.nonEmpty && vs.forall(_ != null) =>
            blooms.get((name, c)).forall { b64 =>
              val bits = DocStore.bloomDecode(b64)
              vs.exists { v =>
                (for (dt <- dtOf(c); bs <- DocStore.bloomBytes(dt, v))
                  yield DocStore.bloomMayContain(bits, bs)).getOrElse(true)
              }
            }
          case _ => true
        }
        val kept = subset.filter { case (f, _) => mayMatch(new Path(f).getName) }
        DocStore.filesBloomSkipped.add(subset.size - kept.size)
        kept
      }
    val dvs = snapOpt.map(_.dvs).getOrElse(Map.empty)
    if (pushedAgg.nonEmpty)
      new DocStoreAggScan(dir, planned, dvs, pushedAgg, fullSchema)
    else
      new DocStoreScan(dir, fullSchema, required, pushed, planned,
        ignoreChanges, dvs)
  }
}

/** One pushed aggregate: op ∈ count / min / max, col empty for count. */
case class DocStoreAggExpr(op: String, col: String)

/** The header-only scan an aggregate pushdown plans: one partition per
  * data file, each emitting ONE partial row computed from block
  * headers ([[DocStore.fileHeaderAgg]]) and the deletion-vector
  * sidecar count — no column chunk is ever decoded. Spark's final
  * aggregation combines the per-file partials (partial pushdown), so
  * the scan keeps one-task-per-file parallelism at any corpus size.
  */
class DocStoreAggScan(
    dir: String,
    files: Seq[(String, Long)],
    dvs: Map[String, String],
    exprs: Seq[DocStoreAggExpr],
    fullSchema: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(exprs.zipWithIndex.map {
    case (DocStoreAggExpr("count", _), i) =>
      StructField(s"agg$i", LongType, nullable = false)
    case (DocStoreAggExpr(_, c), i) =>
      StructField(s"agg$i",
        fullSchema.fields.find(_.name == c).get.dataType, nullable = true)
  })

  override def toBatch: Batch = this

  override def description(): String =
    s"docstore $dir, PushedAggregates: [${exprs.map(e =>
      if (e.op == "count") "COUNT(*)" else s"${e.op.toUpperCase}(${e.col})")
      .mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (f, len) =>
      DocStoreInputPartition(f, len,
        dvs.get(new Path(f).getName).map(dv => new Path(dir, dv).toString))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DocStoreAggReaderFactory(exprs)
}

class DocStoreAggReaderFactory(exprs: Seq[DocStoreAggExpr])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dp = p.asInstanceOf[DocStoreInputPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (done) return false
        done = true
        val (rows, stats) = DocStore.fileHeaderAgg(dp.file)
        val masked = dp.dv.map(DocStore.dvCountOf).getOrElse(0L)
        val vals: Array[Any] = exprs.map {
          case DocStoreAggExpr("count", _) => rows - masked
          case DocStoreAggExpr("min", c) => stats.get(c).map(_._1).orNull
          case DocStoreAggExpr("max", c) => stats.get(c).map(_._2).orNull
          case other =>
            throw new IllegalStateException(s"docstore: bad agg $other")
        }.toArray
        row = new GenericInternalRow(vals)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** One InputPartition per data file — the unit of parallelism a
  * cluster scheduler distributes; locality would come from file block
  * hosts in a distributed FS deployment. `dv` is the absolute path of
  * the snapshot's deletion-vector sidecar for this file, if any.
  */
case class DocStoreInputPartition(file: String, length: Long,
    dv: Option[String] = None)
    extends InputPartition

class DocStoreScan(
    dir: String,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    files: Seq[(String, Long)],
    ignoreChanges: Boolean = false,
    dvs: Map[String, String] = Map.empty)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DocStoreMicroBatchStream(dir, fullSchema, required, pushed,
      ignoreChanges)

  override def description(): String =
    s"docstore $dir, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (f, len) =>
      DocStoreInputPartition(f, len,
        dvs.get(new Path(f).getName).map(dv => new Path(dir, dv).toString))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    // JSON (not DDL): a count(*) prunes required down to an EMPTY
    // struct, which DDL cannot represent
    new DocStoreReaderFactory(fullSchema.json, required.json, pushed)

  /** Raw byte size (pre-pruning); row count left unknown. Lets the
    * planner compare this source against broadcast thresholds.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_._2).sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
}

/** Stream offset = manifest version: the commit log IS the stream. */
case class DocStoreOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Streaming read of the docstore commit log (the Delta streaming-
  * source shape): each micro-batch plans exactly the data files ADDED
  * between two manifest versions, so appends flow through with no
  * rescans — the offset is the manifest version itself, and restart
  * resumes from the checkpointed version. Non-append commits (merge /
  * delete / compact / zorder rewrites retire files) fail loudly unless
  * `ignoreChanges=true`, in which case the REWRITTEN files' rows
  * re-emit (exactly Delta's documented ignoreChanges semantics —
  * downstream must dedup by key).
  *
  * Scale: per trigger the driver reads two manifests (file-count-sized)
  * and diffs names; data work is one task per new file. Vacuumed
  * starting versions fail loudly on restart, the standard retention
  * trade.
  */
class DocStoreMicroBatchStream(
    dir: String,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    ignoreChanges: Boolean)
    extends MicroBatchStream {

  private def filesOf(v: Long): Seq[(String, Long)] =
    if (v <= 0) Nil else DocStore.readManifest(dir, v)

  override def initialOffset(): Offset = DocStoreOffset(0L)

  override def latestOffset(): Offset =
    DocStoreOffset(DocStore.latestVersion(dir).getOrElse(0L))

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val v0 = start.asInstanceOf[DocStoreOffset].v
    val v1 = end.asInstanceOf[DocStoreOffset].v
    if (v1 <= v0) return Array.empty
    // diff key = (name, length), not name alone (ADVICE r14): a file
    // deleted and later re-added under the same name between the two
    // offsets almost surely changes length, so it shows up as a
    // retirement + an addition instead of silently "unchanged" —
    // writers generate UUID-unique names today, this guards the
    // invariant rather than assuming it
    val beforeKeys = filesOf(v0).map { case (f, len) =>
      (new Path(f).getName, len)
    }.toSet
    val after = filesOf(v1)
    val removed = beforeKeys --
      after.map { case (f, len) => (new Path(f).getName, len) }.toSet
    require(removed.isEmpty || ignoreChanges,
      s"docstore streaming: non-append commit between versions $v0 and " +
        s"$v1 (${removed.size} file(s) retired by a rewrite); pass " +
        "ignoreChanges=true to stream the added files anyway " +
        "(rewritten rows re-emit; downstream must dedup by key)")
    // a merge-on-read DELETE changes no file name or length — only the
    // `#dv` bindings — so the (name, length) diff alone would stream
    // right past it and silently KEEP the deleted rows downstream.
    // Same contract as rewrites: loud unless ignoreChanges, in which
    // case the re-masked files re-emit (with the new mask applied)
    val dv0 = if (v0 <= 0) Map.empty[String, String]
      else DocStore.readDvMap(dir, v0)
    val dv1 = DocStore.readDvMap(dir, v1)
    // only files ALREADY STREAMED count as re-masked (ADVICE r15): a
    // brand-new file that arrives with a mask pre-bound — including the
    // whole table on the v0=0 initial load — plans below with the dv1
    // mask applied, so it is a pure (masked) append, not a change
    val beforeNames = beforeKeys.map(_._1)
    val dvChanged = after.map { case (f, _) => new Path(f).getName }
      .filter(n => beforeNames.contains(n) && dv0.get(n) != dv1.get(n))
      .toSet
    require(dvChanged.isEmpty || ignoreChanges,
      s"docstore streaming: deletion-vector commit between versions $v0 " +
        s"and $v1 (${dvChanged.size} file(s) re-masked); pass " +
        "ignoreChanges=true to re-emit the re-masked files " +
        "(downstream must dedup by key)")
    def part(f: String, len: Long) = DocStoreInputPartition(f, len,
      dv1.get(new Path(f).getName).map(dv => new Path(dir, dv).toString))
    after.filter { case (f, len) =>
        !beforeKeys.contains((new Path(f).getName, len)) ||
          dvChanged.contains(new Path(f).getName)
      }
      .map { case (f, len) => part(f, len) }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocStoreReaderFactory(fullSchema.json, required.json, pushed)

  override def commit(end: Offset): Unit = ()

  override def deserializeOffset(json: String): Offset =
    DocStoreOffset(json.toLong)

  override def stop(): Unit = ()
}

class DocStoreReaderFactory(
    fullJson: String,
    requiredJson: String,
    pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dp = p.asInstanceOf[DocStoreInputPartition]
    new DocStorePartitionReader(dp.file,
      DataType.fromJson(fullJson).asInstanceOf[StructType],
      DataType.fromJson(requiredJson).asInstanceOf[StructType], pushed,
      dp.dv)
  }
}

/** Streams one file: per block, stats-prunes against pushed filters,
  * `skipBytes` past unneeded column chunks, decodes the needed ones
  * (required ∪ filter columns), row-filters, emits required columns.
  */
class DocStorePartitionReader(
    file: String,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    dv: Option[String] = None)
    extends PartitionReader[InternalRow] {

  // deletion-vector mask: sorted deleted ordinals; binary search per
  // row. Loaded once per partition — O(deleted) memory, the positional
  // analogue of Delta's DV bitmap
  private val deleted: Array[Long] =
    dv.map(DocStore.readDv).getOrElse(Array.emptyLongArray)
  private def isDeleted(ordinal: Long): Boolean =
    deleted.length > 0 &&
      java.util.Arrays.binarySearch(deleted, ordinal) >= 0
  // file-wide row ordinal of this block's first row — advances past
  // PRUNED blocks too (their row counts are read before skipping)
  private var blockBase: Long = 0L
  private var nextBlockBase: Long = 0L

  private val in: DataInputStream = {
    val p = new Path(file)
    new DataInputStream(p.getFileSystem(new Configuration()).open(p))
  }
  // header: magic + THIS FILE's embedded schema. Each file is
  // self-describing, so the wire layout follows the file schema and
  // table columns map by NAME — a table column absent from an older
  // file reads as all-null (schema evolution: add a column without
  // rewriting history). A same-name column must keep its type.
  private val fileSchema: StructType = {
    DocStore.requireMagic(in.readInt(), file)
    val len = in.readInt()
    val bytes = new Array[Byte](len)
    in.readFully(bytes)
    StructType.fromDDL(new String(bytes, "UTF-8"))
  }
  locally {
    fileSchema.fields.foreach { f =>
      fullSchema.fields.find(_.name == f.name).foreach { tf =>
        require(tf.dataType == f.dataType,
          s"docstore: column ${f.name} is ${f.dataType} in $file but " +
            s"${tf.dataType} in the table schema")
      }
    }
  }

  private val nCols = fileSchema.length
  private val fieldIdx: Map[String, Int] =
    fileSchema.fieldNames.zipWithIndex.toMap
  // columns that must be decoded: (projected ∪ filtered) ∩ present
  private val neededIdx: Set[Int] =
    (required.fieldNames.flatMap(fieldIdx.get) ++
      pushed.flatMap(DocStore.filterColumn).flatMap(fieldIdx.get)).toSet
  // per required output column: its file index, or -1 (absent → null)
  private val requiredIdx: Array[Int] =
    required.fieldNames.map(n => fieldIdx.getOrElse(n, -1))
  private val filtersByCol: Map[Int, Array[Filter]] = pushed
    .filter(f => DocStore.filterColumn(f).exists(fieldIdx.contains))
    .groupBy(f => fieldIdx(DocStore.filterColumn(f).get))
  // filters on columns this file does not carry evaluate against null
  // ONCE: if any fails, the whole file emits nothing
  private val absentColumnsPass: Boolean = pushed
    .filter(f => DocStore.filterColumn(f).exists(c => !fieldIdx.contains(c)))
    .forall(f => DocStore.rowMatches(f, null))

  private var block: Array[Array[Any]] = _ // decoded needed columns
  private var blockRows = 0
  private var rowInBlock = 0
  private var current: InternalRow = _

  private def loadBlock(): Boolean = {
    while (true) {
      val rows =
        try in.readInt()
        catch { case _: EOFException => return false }
      val statsTag = new Array[Byte](nCols)
      val statMin = new Array[Any](nCols)
      val statMax = new Array[Any](nCols)
      val colLen = new Array[Int](nCols)
      var i = 0
      while (i < nCols) {
        statsTag(i) = in.readByte()
        statsTag(i) match {
          case 1 => statMin(i) = in.readLong(); statMax(i) = in.readLong()
          case 2 => statMin(i) = in.readDouble(); statMax(i) = in.readDouble()
          case 3 => statMin(i) = in.readLong(); statMax(i) = in.readLong()
          case _ =>
        }
        colLen(i) = in.readInt()
        i += 1
      }
      val prune = filtersByCol.exists { case (ci, fs) =>
        (statsTag(ci): @unchecked) match {
          case 0 => false
          case 3 => fs.exists(f => !DocStore.blockMayMatchString(f,
            statMin(ci).asInstanceOf[Long], statMax(ci).asInstanceOf[Long]))
          case _ => fs.exists(f =>
            !DocStore.blockMayMatch(f, statMin(ci), statMax(ci)))
        }
      }
      blockBase = nextBlockBase
      nextBlockBase = blockBase + rows
      if (prune) {
        DocStore.blocksSkipped.increment()
        var skip = 0L
        i = 0
        while (i < nCols) { skip += colLen(i); i += 1 }
        var left = skip
        while (left > 0) left -= in.skip(left)
      } else {
        DocStore.blocksRead.increment()
        val cols = new Array[Array[Any]](nCols)
        i = 0
        while (i < nCols) {
          if (neededIdx.contains(i)) cols(i) = readColumn(i, rows)
          else in.skipBytes(colLen(i))
          i += 1
        }
        block = cols
        blockRows = rows
        rowInBlock = 0
        return true
      }
    }
    false
  }

  private def readColumn(ci: Int, rows: Int): Array[Any] = {
    val bitmap = new Array[Byte]((rows + 7) / 8)
    in.readFully(bitmap)
    def isNull(r: Int): Boolean = (bitmap(r >> 3) & (1 << (r & 7))) != 0
    val out = new Array[Any](rows)
    val dt = fileSchema.fields(ci).dataType
    var r = 0
    while (r < rows) {
      if (!isNull(r)) {
        out(r) = dt match {
          case LongType => in.readLong()
          case DoubleType => in.readDouble()
          case BooleanType => in.readBoolean()
          case StringType =>
            val b = new Array[Byte](in.readInt()); in.readFully(b)
            new String(b, "UTF-8")
          case other => throw new IllegalStateException(s"docstore: $other")
        }
      }
      r += 1
    }
    out
  }

  override def next(): Boolean = {
    if (!absentColumnsPass) return false // a null-column filter rejects all
    while (true) {
      if (block == null || rowInBlock >= blockRows) {
        if (!loadBlock()) return false
      }
      while (rowInBlock < blockRows) {
        val r = rowInBlock
        rowInBlock += 1
        // the deletion-vector mask applies BEFORE filters: a deleted
        // row does not exist, whatever the predicate says
        val ok = !isDeleted(blockBase + r) &&
          filtersByCol.forall { case (ci, fs) =>
            fs.forall(f => DocStore.rowMatches(f, block(ci)(r)))
          }
        if (ok) {
          val vals = new Array[Any](requiredIdx.length)
          var i = 0
          while (i < vals.length) {
            val v = if (requiredIdx(i) < 0) null else block(requiredIdx(i))(r)
            vals(i) = v match {
              case s: String => UTF8String.fromString(s)
              case other => other
            }
            i += 1
          }
          current = new GenericInternalRow(vals)
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------- write

class DocStoreWriteBuilder(dir: String, schema: StructType,
    replaceFiles: Set[String], commitTs: Option[Long] = None,
    readVersion: Option[Long] = None,
    keyDomain: Option[(String, Long, Long)] = None,
    bloomCols: Seq[String] = Seq.empty)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new DocStoreBatchWrite(dir, schema, doTruncate, replaceFiles, commitTs,
        readVersion, keyDomain, bloomCols)
  }
}

/** `blooms` = (column → base64 Bloom bits) of this task's file, for the
  * writers asked (via `bloomCols`) to index their output.
  */
case class DocStoreCommitMessage(tmpPath: String, finalPath: String,
    blooms: Seq[(String, String)] = Seq.empty)
    extends WriterCommitMessage

/** Rename-on-job-commit protocol: tasks stream to `.tmp` files; only
  * the driver's job commit renames them to visible `.gds` names, so a
  * failed/speculative task never publishes partial data.
  */
/** `replaceFiles`: file NAMES excluded from the inherited base when the
  * new manifest commits — the one-atomic-rename file-swap primitive
  * (Iceberg RewriteFiles): a MERGE or OPTIMIZE writes its rewritten
  * rows as new files and retires the superseded ones in the SAME
  * commit, so no reader can observe the duplicated intermediate state.
  */
class DocStoreBatchWrite(dir: String, schema: StructType, truncate: Boolean,
    replaceFiles: Set[String], commitTs: Option[Long] = None,
    readVersion: Option[Long] = None,
    keyDomain: Option[(String, Long, Long)] = None,
    bloomCols: Seq[String] = Seq.empty)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    // truncate no longer deletes prior data files (VERDICT r12 #6):
    // concurrent readers of the previous snapshot still hold its file
    // list, so physical deletion is deferred to DocStore.vacuum — the
    // overwrite is expressed purely by the new manifest listing only
    // this job's files
    fs.mkdirs(p)
    // job-unique filename token: final names must be unique ACROSS JVMs
    // and jobs, not just within one — snapshot isolation (r12 #6) keeps
    // superseded .gds files on disk until vacuum, and Spark task ids
    // restart per JVM, so a (partitionId, taskId) pair from a previous
    // run can collide with a live leftover and fail the commit rename
    // (seen as a ~1-in-3 full-suite flake in the r13 inventory sweep,
    // intermittent because query-map iteration order shifts the task-id
    // offset at which the docstore write runs)
    new DocStoreWriterFactory(dir, schema.toDDL,
      java.util.UUID.randomUUID().toString.take(8), bloomCols)
  }

  /** Optimistic-concurrency commit (r15, VERDICT r14 #1 — the
    * Delta/Iceberg commit protocol): publish this job's files by
    * version-CAS on the manifest number. Each attempt re-reads the
    * CURRENT latest manifest, re-applies this commit's logical change
    * (drop `replaceFiles`, add the new files) on top of it, and tries
    * to publish latest+1; [[DocStore.writeManifest]] is the CAS — it
    * refuses to overwrite an existing version. Losing the race is not
    * an error: the loser REBASES onto the winner's snapshot and
    * retries, PROVIDED the two commits are logically disjoint — every
    * file this commit retires must still be live in the winner's
    * manifest. If a racing commit already retired (rewrote) one of
    * them, the two writers rewrote the same rows from different base
    * snapshots; blindly rebasing would silently resurrect or drop
    * rows, so the loser aborts LOUDLY (Delta's
    * ConcurrentDeleteDeleteException shape) and cleans up its
    * now-orphaned data files. Appends (`replaceFiles` empty) conflict
    * with nothing and always rebase-retry; truncate rebases too (its
    * base is empty by definition — serializing it after the winner).
    *
    * Two conflict axes beyond file retirement (both r15 ADVICE /
    * VERDICT upgrades, both gated on the writer declaring
    * `readVersion` — legacy callers keep WriteSerializable):
    *
    *   - DELETION-VECTOR drift: a merge-on-read delete landing between
    *     this rewrite's (masked) read and its commit would be silently
    *     discarded by the DV carry-forward (the new files materialize
    *     the OLD mask), resurrecting deleted rows — so the commit
    *     aborts when any `replaceFiles` DV binding moved since
    *     `readVersion` (the mirror of deleteVectors' own re-mask
    *     guard; conflict detection is now bidirectional).
    *   - KEY-DOMAIN overlap (the Serializable upgrade over Delta's
    *     WriteSerializable default): a writer may declare the logical
    *     key range it read-modified (`keyDomain` = col,min,max — a
    *     MERGE's batch keys); the commit aborts if any intervening
    *     commit since `readVersion` declared an overlapping domain on
    *     the same column. Two racing MERGEs inserting the SAME new key
    *     touch disjoint files (no file conflict) yet are not
    *     serializable — the domain check catches exactly that phantom.
    *     Commits that declare no domain (plain appends, compaction)
    *     conflict with nothing on this axis — documented scope.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(new Configuration())
    val newFiles = messages.collect {
      // empty-path message = a zero-row task that published nothing
      case DocStoreCommitMessage(tmp, fin, _) if tmp.nonEmpty =>
        val t = new Path(tmp)
        val f = new Path(fin)
        if (fs.exists(t) && !fs.rename(t, f))
          throw new java.io.IOException(s"docstore: commit rename failed: $tmp")
        (fin, fs.getFileStatus(f).getLen)
      case other if !other.isInstanceOf[DocStoreCommitMessage] =>
        throw new IllegalStateException(s"docstore: foreign message $other")
    }.toSeq
    // this job's Bloom indexes, keyed by published file name
    val newBlooms: Map[(String, String), String] = messages.collect {
      case DocStoreCommitMessage(tmp, fin, bs) if tmp.nonEmpty =>
        val n = new Path(fin).getName
        bs.map { case (c, b64) => ((n, c), b64) }
    }.flatten.toMap
    val newNames = newFiles.map { case (f, _) => new Path(f).getName }.toSet
    var committed = false
    while (!committed) {
      // the base is re-captured EVERY attempt — losing the CAS means a
      // concurrent commit moved the snapshot, and the retry must carry
      // the winner's files forward (the r14 code captured the base
      // once and bumped only the version number, which silently
      // dropped the winner's files: last-rename-wins)
      val latest = DocStore.latestVersion(dir)
      // test seam: a competing commit injected in the NARROWEST race
      // window — after this attempt's snapshot read, before its CAS —
      // so the first writeManifest genuinely loses and the retry path
      // (rebase + conflict re-check) runs for real
      val hook = DocStore.commitRaceHook
      DocStore.commitRaceHook = None
      hook.foreach(_())
      // ONE manifest body read per attempt serves files + DVs + Blooms
      // (r16): the manifest is file-count-sized at 100 TB, and the
      // pre-r16 code re-read it once per header kind
      val snapNow = latest.map(v => DocStore.readSnapshot(dir, v))
      val inherited: Seq[(String, Long)] =
        if (truncate) Seq.empty
        else snapNow match {
          case Some(sn) => sn.files
          // legacy manifest-less dir adopts its listing — minus this
          // job's just-renamed files, which would otherwise double-count
          case None => DocStore.listDataFiles(dir).filterNot { case (f, _) =>
            newNames.contains(new Path(f).getName)
          }
        }
      val liveNames = inherited.map { case (f, _) =>
        new Path(f).getName
      }.toSet
      def abortConflict(msg: String): Nothing = {
        // clean up our unreferenced outputs and abort loudly
        newFiles.foreach { case (f, _) => fs.delete(new Path(f), false) }
        throw new java.util.ConcurrentModificationException(
          s"docstore: conflicting concurrent commit under $dir — " + msg +
            "; rerun the operation against the new snapshot")
      }
      val gone = replaceFiles -- liveNames
      if (gone.nonEmpty && !truncate)
        // a racing commit rewrote files this commit also rewrites
        abortConflict(s"${gone.size} file(s) this commit rewrites were " +
          s"already retired by another writer (${gone.take(3).mkString(", ")}" +
          s"${if (gone.size > 3) ", …" else ""})")
      val dvNow = snapNow.map(_.dvs).getOrElse(Map.empty)
      // a deletion-vector commit landing after this rewrite's read
      // re-masked a file this commit replaces: the rewrite read the OLD
      // mask, so carrying on would silently drop those deletes
      // (ADVICE r15 — the mirror of deleteVectors' re-mask guard)
      readVersion.foreach { rv =>
        val dvAtRead = DocStore.readDvMap(dir, rv)
        val reMasked = replaceFiles
          .filter(n => dvNow.get(n) != dvAtRead.get(n))
        if (reMasked.nonEmpty && !truncate)
          abortConflict(s"${reMasked.size} file(s) this commit rewrites " +
            "were re-masked by a concurrent deletion-vector commit " +
            s"(${reMasked.take(3).mkString(", ")})")
      }
      // key-domain serializability (r15 VERDICT #7): abort if any
      // commit since this writer's read declared a key domain on the
      // same column overlapping ours — the racing-MERGE-same-new-key
      // phantom that file-level disjointness cannot see
      for ((kcol, kmin, kmax) <- keyDomain; rv <- readVersion;
           w <- (rv + 1) to latest.getOrElse(0L);
           (c2, mn2, mx2) <- DocStore.readKeyDomain(dir, w)
           if c2 == kcol && kmin <= mx2 && kmax >= mn2)
        abortConflict(s"commit v$w declared key domain [$mn2,$mx2] on " +
          s"'$c2' overlapping this commit's [$kmin,$kmax]")
      val base = inherited.filterNot { case (f, _) =>
        replaceFiles.contains(new Path(f).getName)
      }
      // deletion vectors ride forward for inherited files; files this
      // commit replaces lose theirs (the rewrite read them MASKED, so
      // the new files already materialize the deletes), and new files
      // never start with one
      val dvs = dvNow.filterNot { case (n, _) => replaceFiles.contains(n) }
      // Bloom indexes ride forward for inherited files (like DVs) and
      // this job's files contribute theirs; replaced files drop theirs
      val blooms = snapNow.map(_.blooms).getOrElse(Map.empty)
        .filterNot { case ((n, _), _) => replaceFiles.contains(n) } ++
        newBlooms
      val v = latest.getOrElse(0L) + 1
      committed = DocStore.writeManifest(dir, v, base ++ newFiles,
        commitTs.getOrElse(System.currentTimeMillis()), dvs, keyDomain,
        blooms, Some(schema.toDDL))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(new Configuration())
    messages.foreach {
      case DocStoreCommitMessage(tmp, _, _) if tmp.nonEmpty =>
        val t = new Path(tmp)
        if (fs.exists(t)) fs.delete(t, false)
      case _ =>
    }
  }
}

class DocStoreWriterFactory(dir: String, schemaDdl: String, jobToken: String,
    bloomCols: Seq[String] = Seq.empty)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DocStoreDataWriter(dir, StructType.fromDDL(schemaDdl), partitionId,
      taskId, jobToken, bloomCols)
}

class DocStoreDataWriter(
    dir: String,
    schema: StructType,
    partitionId: Int,
    taskId: Long,
    jobToken: String,
    bloomCols: Seq[String] = Seq.empty)
    extends DataWriter[InternalRow] {

  private val tmpPath = s"$dir/part-$partitionId-$taskId-$jobToken.tmp"
  private val finalPath = s"$dir/part-$partitionId-$taskId-$jobToken.gds"
  private val out: DataOutputStream = {
    val p = new Path(tmpPath)
    new DataOutputStream(p.getFileSystem(new Configuration()).create(p, true))
  }
  locally {
    out.writeInt(DocStore.Magic2)
    val ddl = schema.toDDL.getBytes("UTF-8")
    out.writeInt(ddl.length)
    out.write(ddl)
  }

  private val buffer = new ArrayBuffer[Array[Any]]()
  private var rowsWritten = 0L

  // per-column Bloom accumulators for the columns the writer was asked
  // to index (bloomCols write option): (column, schema ordinal, bits)
  private val bloomAcc: Seq[(String, Int, Array[Long])] =
    bloomCols.flatMap { c =>
      val i = schema.fieldNames.indexOf(c)
      if (i < 0) None
      else Some((c, i, new Array[Long](DocStore.BloomBits / 64)))
    }

  override def write(row: InternalRow): Unit = {
    rowsWritten += 1
    if (bloomAcc.nonEmpty) {
      bloomAcc.foreach { case (_, i, bits) =>
        if (!row.isNullAt(i)) {
          val v: Any = schema.fields(i).dataType match {
            case LongType => row.getLong(i)
            case DoubleType => row.getDouble(i)
            case BooleanType => row.getBoolean(i)
            case StringType => row.getUTF8String(i).toString
            case other => throw new IllegalStateException(s"docstore: $other")
          }
          DocStore.bloomBytes(schema.fields(i).dataType, v)
            .foreach(DocStore.bloomAdd(bits, _))
        }
      }
    }
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      vals(i) =
        if (row.isNullAt(i)) null
        else schema.fields(i).dataType match {
          case LongType => row.getLong(i)
          case DoubleType => row.getDouble(i)
          case BooleanType => row.getBoolean(i)
          case StringType => row.getUTF8String(i).toString
          case other => throw new IllegalStateException(s"docstore: $other")
        }
      i += 1
    }
    buffer += vals
    if (buffer.length >= DocStore.BlockRows) flushBlock()
  }

  private def flushBlock(): Unit = {
    if (buffer.isEmpty) return
    val rows = buffer.length
    out.writeInt(rows)
    // encode each column chunk to bytes first (lengths go in the header)
    val chunks = new Array[Array[Byte]](schema.length)
    var ci = 0
    while (ci < schema.length) {
      val bos = new java.io.ByteArrayOutputStream()
      val cout = new DataOutputStream(bos)
      val bitmap = new Array[Byte]((rows + 7) / 8)
      var r = 0
      while (r < rows) {
        if (buffer(r)(ci) == null) bitmap(r >> 3) =
          (bitmap(r >> 3) | (1 << (r & 7))).toByte
        r += 1
      }
      cout.write(bitmap)
      r = 0
      while (r < rows) {
        val v = buffer(r)(ci)
        if (v != null) v match {
          case l: Long => cout.writeLong(l)
          case d: Double => cout.writeDouble(d)
          case b: Boolean => cout.writeBoolean(b)
          case s: String =>
            val b = s.getBytes("UTF-8"); cout.writeInt(b.length); cout.write(b)
          case other => throw new IllegalStateException(s"docstore: $other")
        }
        r += 1
      }
      cout.flush()
      chunks(ci) = bos.toByteArray
      ci += 1
    }
    // header: per-column stats + chunk length
    ci = 0
    while (ci < schema.length) {
      val nonNull = buffer.iterator.map(_(ci)).filter(_ != null).toSeq
      schema.fields(ci).dataType match {
        case LongType if nonNull.nonEmpty =>
          val ls = nonNull.map(_.asInstanceOf[Long])
          out.writeByte(1); out.writeLong(ls.min); out.writeLong(ls.max)
        case DoubleType if nonNull.nonEmpty =>
          val ds = nonNull.map(_.asInstanceOf[Double])
          out.writeByte(2); out.writeDouble(ds.min); out.writeDouble(ds.max)
        case StringType if nonNull.nonEmpty =>
          // tag 3: unsigned min/max of the packed 8-byte UTF-8 prefix
          // (equality-shaped pruning; see blockMayMatchString)
          val ps = nonNull.map(s =>
            DocStore.packPrefix(s.asInstanceOf[String]))
          out.writeByte(3)
          out.writeLong(ps.reduce((a, b) =>
            if (java.lang.Long.compareUnsigned(a, b) <= 0) a else b))
          out.writeLong(ps.reduce((a, b) =>
            if (java.lang.Long.compareUnsigned(a, b) >= 0) a else b))
        case _ => out.writeByte(0)
      }
      out.writeInt(chunks(ci).length)
      ci += 1
    }
    ci = 0
    while (ci < schema.length) { out.write(chunks(ci)); ci += 1 }
    buffer.clear()
  }

  override def commit(): WriterCommitMessage = {
    flushBlock()
    out.close()
    // an empty task publishes NOTHING (r16): a sparse write (e.g. a
    // 1-row merge batch over 32 partitions) would otherwise land 31
    // header-only files — manifest bloat that every later merge
    // conservatively rewrites (no stats = affected), turning pure
    // inserts into spurious file conflicts at scale
    if (rowsWritten == 0L) {
      val t = new Path(tmpPath)
      val fs = t.getFileSystem(new Configuration())
      if (fs.exists(t)) fs.delete(t, false)
      DocStoreCommitMessage("", "")
    } else DocStoreCommitMessage(tmpPath, finalPath,
      bloomAcc.map { case (c, _, bits) => (c, DocStore.bloomEncode(bits)) })
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => }
    val p = new Path(tmpPath)
    val fs = p.getFileSystem(new Configuration())
    if (fs.exists(p)) fs.delete(p, false)
  }

  override def close(): Unit = ()
}
