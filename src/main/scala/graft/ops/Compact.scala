package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction (operational companion to the incremental
  * sinks).
  *
  * Incremental/streaming writers (the reference appends one JSONL
  * record per LLM call, app/main.py:110-111; our streaming file sink
  * commits per micro-batch) accumulate many small files; at scale that
  * degrades every later scan (one task + one open per file, tiny row
  * groups defeat min/max pruning). Compaction rewrites a directory into
  * files of a target size:
  *
  *   - input size comes from the file system listing (no data scan);
  *   - file count = ceil(bytes / targetFileBytes) — a repartition to
  *     that count is the only shuffle, and it's the point (a coalesce
  *     would skip the shuffle but chain upstream partitioning into the
  *     write, producing skewed files);
  *   - output goes to a NEW directory + atomic-ish swap left to the
  *     caller (never rewrite in place — a failed job must not destroy
  *     the input).
  */
object Compact {

  /** Bytes in `dir` (recursive), from the listing only. */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Target output file count for `dir` at `targetFileBytes`. */
  def targetFiles(spark: SparkSession, dir: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0)
    math.max(1, math.ceil(dirBytes(spark, dir).toDouble / targetFileBytes).toInt)
  }

  /** Rewrite parquet `inDir` into `outDir` as ~targetFileBytes files. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long): Int = {
    val n = targetFiles(spark, inDir, targetFileBytes)
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Same for JSONL dirs (schema must be declared — inference would be
    * a second full read).
    */
  def compactJson(spark: SparkSession, inDir: String, outDir: String,
                  schema: org.apache.spark.sql.types.StructType,
                  targetFileBytes: Long): Int = {
    val n = targetFiles(spark, inDir, targetFileBytes)
    spark.read.schema(schema).json(inDir).repartition(n)
      .write.mode("overwrite").json(outDir)
    n
  }

  /** Convenience: compacted DataFrame without writing (for chaining). */
  def repartitionToTarget(spark: SparkSession, df: DataFrame, inDir: String,
                          targetFileBytes: Long): DataFrame =
    df.repartition(targetFiles(spark, inDir, targetFileBytes))
}
