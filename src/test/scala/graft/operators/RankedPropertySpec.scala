package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized properties of the distributed total-order machinery
  * (`Ranked.globalRank` / `Ranked.runningSum`): for random inputs across
  * random partition counts, the two-pass range-partitioned forms must
  * land exactly where a sequential scan lands. Fixed seeds (offline, no
  * scalatest-scalacheck bridge) so failures replay deterministically.
  */
class RankedPropertySpec extends SparkSpec {

  private val gen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 400)
    keys <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    vals <- Gen.listOfN(n, Gen.choose(0L, 5000L))
  } yield keys.distinct.zip(vals) // distinct keys: ties take scan order

  private def sample(i: Long): List[(Long, Long)] =
    gen(Gen.Parameters.default, Seed(i)).get

  test("runningSum == sequential scanLeft for random inputs") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val data = sample(seed)
      val got = Ranked.runningSum(
          data.toDF("k", "v").repartition(7), Seq(col("k")), col("v"))
        .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var cum = 0L
      val want = data.sortBy(_._1).map { case (k, v) => cum += v; k -> cum }.toMap
      assert(got == want, s"seed $seed: distributed prefix sum diverged")
    }
  }

  // skewed strata: ~80% of rows land in stratum 0 — the one-source-
  // dominates mixture that motivates stratifiedRank over the window
  private val stratGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 400)
    keys <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    ss <- Gen.listOfN(n, Gen.frequency(8 -> Gen.const(0L), 1 -> Gen.choose(1L, 4L)))
  } yield keys.distinct.zip(ss) // distinct keys: ties take scan order

  private def stratSample(i: Long): List[(Long, Long)] =
    stratGen(Gen.Parameters.default, Seed(i)).get

  test("stratifiedRank == partitioned-window row_number for skewed strata") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (seed <- 21L to 26L) {
      val data = stratSample(seed)
      val df = data.toDF("k", "s").repartition(7)
      val got = Ranked.stratifiedRank(df, Seq(col("s")), Seq(col("k")), "rnk")
        .select("s", "k", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = df.withColumn("rnk",
          row_number().over(Window.partitionBy(col("s")).orderBy(col("k"))).cast("long"))
        .select("s", "k", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"seed $seed: stratified rank diverged from the window")
    }
  }

  test("globalRank == sequential sort index for random inputs") {
    import spark.implicits._
    for (seed <- 11L to 16L) {
      val data = sample(seed)
      val got = Ranked.globalRank(
          data.toDF("k", "v").repartition(5), Seq(col("k")))
        .select("k", "idx").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = data.map(_._1).sorted.zipWithIndex
        .map { case (k, i) => k -> (i + 1L) }.toMap
      assert(got == want, s"seed $seed: distributed rank diverged")
    }
  }
}
