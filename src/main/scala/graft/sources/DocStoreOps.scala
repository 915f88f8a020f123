package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Table-maintenance operations on the `docstore` DSv2 source — the two
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
  *   - [[compact]] — the OPTIMIZE job: bin-packs small files into
  *     target-sized ones and retires the originals, executing the plan
  *     `q_compaction_plan` only computes.
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

  /** MERGE `batch` into the docstore table at `dir` on long key `key`:
    * rows whose key matches an existing row replace it; the rest
    * insert. Single-concurrent-writer discipline (the manifest-commit
    * contract). `batch` must carry exactly the table's columns.
    */
  def merge(spark: SparkSession, dir: String, batch: DataFrame,
      key: String): Unit = {
    val v = DocStore.latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"docstore: no snapshot under $dir"))
    val files = DocStore.readManifest(dir, v)

    // metadata-only affected-file pruning: per-file [min, max] of the
    // key from block headers; a file with no stats (empty/all-null) is
    // conservatively affected
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
    // file-range table is metadata-small → broadcast; batch keys stay
    // distributed. The collect below is bounded by the FILE count.
    val hit = batch.select(col(key).as("mk")).distinct()
      .join(broadcast(rangeDf),
        col("mk") >= col("kmin") && col("mk") <= col("kmax"))
      .select("file").distinct().collect().map(_.getString(0))
    val affected = (hit ++ statless).toSet

    val tableCols = spark.read.format("docstore").load(dir).columns
    val out =
      if (affected.isEmpty) batch.select(tableCols.map(col).toSeq: _*)
      else {
        val touched = spark.read.format("docstore")
          .option("files", affected.mkString(","))
          .load(dir)
        touched.join(batch.select(col(key)), Seq(key), "left_anti")
          .unionByName(batch)
          .select(tableCols.map(col).toSeq: _*)
      }
    out.write.format("docstore").mode("append")
      .option("replaceFiles", affected.mkString(","))
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
      .option("files", names.mkString(","))
      .load(dir)
      .repartition(bins)
      .write.format("docstore").mode("append")
      .option("replaceFiles", names.mkString(","))
      .save(dir)
    val after = DocStore.readManifest(dir,
      DocStore.latestVersion(dir).get).size
    (files.size, after)
  }
}
