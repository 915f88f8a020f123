package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocStore, DocStoreOps}

/** REAL-THREAD optimistic-concurrency soak (r16): the hook-injected
  * races (DocStoreSpec) pin each conflict rule deterministically, but
  * single-threaded; this spec runs genuinely concurrent commits —
  * every writer released by one latch — so the version-CAS, the
  * rebase-retry loop, and the conflict aborts are exercised under
  * true wall-clock interleavings (the only way to catch an atomicity
  * hole in the exists-check + tmp-write + rename CAS itself).
  */
class DocStoreOccSoakSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** Run `n` thunks concurrently, all released together; returns the
    * per-thunk outcome (None = success, Some(t) = what it threw).
    */
  private def race(n: Int)(f: Int => Unit): Seq[Option[Throwable]] = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results = new Array[Option[Throwable]](n)
    (0 until n).foreach { i =>
      pool.execute { () =>
        start.await()
        results(i) =
          try { f(i); None }
          catch { case t: Throwable => Some(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "soak timed out")
    results.toSeq
  }

  private def isCme(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .exists(_.isInstanceOf[java.util.ConcurrentModificationException])

  test("8 concurrent appends all land: every writer rebases past the " +
    "others, versions are consecutive, no row lost or duplicated") {
    val dir = tmp("gds_soak_append")
    spark.range(10).select(col("id").as("k"), lit(0L).as("v")).coalesce(1)
      .write.format("docstore").mode("overwrite").save(dir)
    val outcomes = race(8) { i =>
      spark.range(100L * (i + 1), 100L * (i + 1) + 10)
        .select(col("id").as("k"), lit(i.toLong).as("v")).coalesce(1)
        .write.format("docstore").mode("append").save(dir)
    }
    assert(outcomes.forall(_.isEmpty),
      s"appends conflict with nothing: ${outcomes.flatten.headOption}")
    assert(DocStore.latestVersion(dir).get == 9L,
      "8 commits on top of v1 = v9, no version skipped or stolen")
    val ks = spark.read.format("docstore").load(dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == ((0L until 10L) ++
      (1 to 8).flatMap(i => 100L * i until 100L * i + 10)).sorted,
      "every append's rows present exactly once")
  }

  test("8 concurrent merges of the SAME new key: exactly one lands per " +
    "round, losers abort with CME, rerun-until-landed serializes all") {
    val dir = tmp("gds_soak_keydom")
    spark.range(64).select(col("id").as("k"), lit(0L).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.format("docstore").mode("overwrite").save(dir)
    // every writer upserts key 999 with its own value, retrying on
    // conflict (the documented rerun contract) until it lands
    val landed = ArrayBuffer.empty[Int]
    val outcomes = race(8) { i =>
      val batch = spark.range(1)
        .select(lit(999L).as("k"), lit(i.toLong).as("v"))
      var done = false
      var attempts = 0
      while (!done) {
        attempts += 1
        require(attempts <= 20, s"writer $i live-locked")
        try { DocStoreOps.merge(spark, dir, batch, "k"); done = true }
        catch { case t: Throwable if isCme(t) => () /* rerun */ }
      }
      landed.synchronized { landed += i }
    }
    assert(outcomes.forall(_.isEmpty), s"all must eventually land: " +
      s"${outcomes.flatten.headOption}")
    assert(landed.size == 8)
    val rows = spark.read.format("docstore").load(dir)
      .filter(col("k") === 999L).collect()
    assert(rows.length == 1,
      s"serializable: exactly ONE row for the contended key, got ${rows.length}")
    // the surviving value is one writer's upsert intact (which one is
    // the last COMMIT in version order — racing the `landed` bookkeeping
    // would make asserting on list order flaky, so pin membership only)
    assert((0L until 8L).contains(rows(0).getLong(1)),
      "final value must be exactly one writer's upsert")
    assert(spark.read.format("docstore").load(dir).count() == 65L,
      "base rows intact, one contended row")
  }

  test("concurrent DV deletes of disjoint keys in the SAME file: " +
    "losers abort on the re-mask guard, reruns converge to the union") {
    val dir = tmp("gds_soak_dv")
    spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.format("docstore").mode("overwrite").save(dir)
    val outcomes = race(4) { i =>
      val keys = spark.range(10L * i, 10L * i + 3).select(col("id").as("k"))
      var done = false
      var attempts = 0
      while (!done) {
        attempts += 1
        require(attempts <= 20, s"deleter $i live-locked")
        try { DocStoreOps.deleteVectors(spark, dir, keys, "k"); done = true }
        catch { case t: Throwable if isCme(t) => () }
      }
    }
    assert(outcomes.forall(_.isEmpty),
      s"all DV deletes must eventually land: ${outcomes.flatten.headOption}")
    val gone = (0 until 4).flatMap(i => 10L * i until 10L * i + 3).toSet
    val ks = spark.read.format("docstore").load(dir)
      .collect().map(_.getLong(0)).toSet
    assert(ks == (0L until 100L).toSet -- gone,
      "every delete batch applied exactly once — no mask lost to a race")
  }
}
