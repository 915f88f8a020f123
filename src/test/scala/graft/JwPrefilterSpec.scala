package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark
import graft.functions.JaroWinkler
import graft.plans.JaroWinklerPrefilter

/** Gates for the JaroWinklerPrefilter optimizer rule: the length-ratio
  * bound is SOUND (brute-forced against the kernel), the guard is
  * actually injected into q_fuzzy_join's optimized plan, and rule-on ==
  * rule-off rows on a length-diverse planted frame.
  */
class JwPrefilterSpec extends AnyFunSuite {

  test("bound soundness: jw >= c implies min/max length ratio >= 5c-4") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    def randStr() = (0 until (1 + rnd.nextInt(14)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 20000) {
      val a = randStr(); val b = randStr()
      val jw = JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      for (c <- Seq(0.85, 0.9, 0.95) if jw >= c) {
        val r = math.min(a.length, b.length).toDouble /
          math.max(a.length, b.length)
        assert(r >= 5.0 * c - 4.0 - 1e-9,
          s"bound violated: jw($a, $b) = $jw >= $c but ratio $r < ${5 * c - 4}")
      }
    }
  }

  test("q_fuzzy_join's optimized plan carries the injected length guard") {
    val lp = SparkEntry.queries("q_fuzzy_join")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    val s = lp.toString
    assert(s.contains("greatest(") && s.contains("least(") &&
      s.toLowerCase.contains("length("),
      s"length-ratio guard not injected:\n$s")
  }

  test("rule-on == rule-off rows on a length-diverse planted frame") {
    import spark.implicits._
    import graft.functions.JaroWinkler.jaroWinkler
    val names = Seq("small ring", "small rink", "ring", "a",
      "small ring extra long variant", "smal ring", "ring small",
      "large ring", "small ping", "smallring")
    val pairs = for (a <- names; b <- names) yield (a, b)
    // parquet-backed, not a LocalRelation: ConvertToLocalRelation would
    // otherwise constant-fold the whole filter away at optimization time
    val dir = java.nio.file.Files.createTempDirectory("jwpf").toString
    pairs.toDF("a", "b").write.mode("overwrite").parquet(dir)
    def frame() = spark.read.parquet(dir)
      .filter(jaroWinkler(col("a"), col("b")) >= 0.9)
    def run(): Seq[(String, String)] = frame()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // rule off: remove from extraOptimizations, then restore
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ eq JaroWinklerPrefilter)
    val off = try run() finally {
      spark.experimental.extraOptimizations = saved
    }
    JaroWinklerPrefilter.install(spark)
    val on = run()
    assert(on == off, s"rule changed results:\n on  $on\n off $off")
    assert(on.nonEmpty, "planted frame should produce matches")
    // and the guard is present in this plan too
    val s = frame().queryExecution.optimizedPlan.toString
    assert(s.contains("greatest("), s"no guard in planted plan:\n$s")
  }
}
