package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Testdata-drift hardening (VERDICT r7 item 6): driver regenerations
  * have flipped parquet timestamp encodings between instant
  * (isAdjustedToUTC, read as TimestampType) and naive (NTZ, read as
  * TimestampNTZType). Tables.t must hand every consumer TimestampType
  * regardless of which encoding the current testdata carries, with
  * wall-clock values unchanged (session TZ is pinned UTC, so the two
  * encodings denote the same instants).
  */
class TablesNtzSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("Tables.t folds a synthesized NTZ parquet column to TimestampType") {
    val dir = Files.createTempDirectory("graft-ntz").toFile
    dir.deleteOnExit()
    val rows = spark.range(3)
      .withColumn("ts",
        col("id").cast(TimestampType).cast(TimestampNTZType))
      .withColumn("label", concat(lit("r"), col("id")))
    assert(rows.schema("ts").dataType == TimestampNTZType)
    rows.write.mode("overwrite").parquet(s"${dir.getPath}/evt.parquet")

    val back = Tables.t(spark, dir.getPath, "evt")
    assert(back.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${back.schema("ts").dataType}")
    // wall-clock identity: epoch seconds 0,1,2 under UTC
    val secs = back.select(unix_timestamp(col("ts")).as("s"))
      .orderBy("s").collect().map(_.getLong(0)).toSeq
    assert(secs == Seq(0L, 1L, 2L))
    // non-timestamp columns untouched
    assert(back.schema("label").dataType == StringType)
  }

  test("events/orders/lineitem load with TimestampType against current testdata") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
    assert(Tables.orders(spark, sf).schema("o_orderdate").dataType == TimestampType)
    assert(Tables.lineitem(spark, sf).schema("l_shipdate").dataType == TimestampType)
    // and the scan actually executes (plan-build used to throw here)
    assert(Tables.events(spark, sf).limit(1).count() == 1L)
  }

  test("no declared query emits an ArrayType/MapType/StructType output column") {
    // SURVEY §7.5: the driver comparator hashes cell values; nested
    // types are unhashable there. q_inverted_index regressed on this
    // in r7 — pin the whole inventory scalar-only.
    for ((k, q) <- SparkEntry.queries) {
      val bad = q(spark, sf).schema.fields.collect {
        case StructField(n, _: ArrayType, _, _)  => n
        case StructField(n, _: MapType, _, _)    => n
        case StructField(n, _: StructType, _, _) => n
      }
      assert(bad.isEmpty, s"$k emits non-scalar columns: ${bad.mkString(",")}")
    }
  }
}
