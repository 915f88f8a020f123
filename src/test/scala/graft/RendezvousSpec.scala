package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Brute-force replay + law gate for q_rendezvous: recomputes the
  * highest-random-weight argmax per document with java.security MD5
  * (first 12 hex chars as a 48-bit key, the repo's shared md5-48
  * idiom) and pins the property that makes rendezvous hashing the
  * elastic-reshard choice — when the 9th shard is added, every doc
  * that moves moves TO the new shard, so n_shard9 of the new shard
  * equals the total moved-out count and every old shard only shrinks.
  */
class RendezvousSpec extends AnyFunSuite {

  private def h48(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q_rendezvous equals an MD5 replay and moves only to the new shard") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val assign = ids.map { id =>
      val hs = (0 to 8).map(s => h48(s"$id#$s"))
      val s8 = hs.take(8).zipWithIndex.maxBy { case (h, i) => (h, -i) }._2
      val s9 = hs.zipWithIndex.maxBy { case (h, i) => (h, -i) }._2
      (s8.toLong, s9.toLong)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (0L to 8L).map { s =>
      val n8 = assign.count(_._1 == s).toLong
      val n9 = assign.count(_._2 == s).toLong
      val moved = assign.count(a => a._1 == s && a._2 != s).toLong
      val frac = if (n8 == 0) 0.0 else r6(moved.toDouble / n8)
      s -> (n8, n9, moved, frac)
    }.toMap
    val got = SparkEntry.queries("q_rendezvous")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == want)
    // rendezvous laws: moved docs land ONLY on the new shard; old
    // shards never grow; both assignments partition the corpus
    assert(got(8L)._1 == 0L && got(8L)._3 == 0L)
    assert(got(8L)._2 == (0L to 7L).map(got(_)._3).sum, "moved != new-shard size")
    (0L to 7L).foreach { s =>
      assert(got(s)._2 == got(s)._1 - got(s)._3, s"shard $s grew on reshard")
    }
    assert(got.values.map(_._1).sum == ids.length.toLong)
    assert(got.values.map(_._2).sum == ids.length.toLong)
  }
}
