package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvSketch

class SketchesSpec extends SparkSpec {

  test("kmv sketch holds exactly the K smallest distinct hashes") {
    KmvSketch.register(spark)
    import spark.implicits._
    // 40 partitions over 10k values with duplicates: exercises update,
    // partial/merge and the serde path across shuffle boundaries
    val df = spark.range(10000).repartition(40)
      .select(md5((col("id") % 3000).cast("string")).as("h"))
    val sketch = df.agg(KmvSketch(col("h")).as("s"))
      .select(explode(col("s")).as("h")).as[String].collect().toSeq
    val expected = df.select("h").distinct().orderBy("h")
      .as[String].take(KmvSketch.DefaultK).toSeq
    assert(sketch == expected)
  }

  test("kmv serde is delimiter-safe: newline-bearing values survive shuffle") {
    KmvSketch.register(spark)
    import spark.implicits._
    // values containing '\n' forced through the partial/merge serde path
    val df = spark.range(200).repartition(20)
      .select(concat(lit("a\nb"), (col("id") % 50).cast("string")).as("h"))
    val s = df.agg(KmvSketch(col("h")).as("s"))
      .select(explode(col("s")).as("h")).as[String].collect().toSeq
    val expected = df.select("h").distinct().orderBy("h")
      .as[String].take(KmvSketch.DefaultK).toSeq
    assert(s == expected)
    assert(s.forall(_.contains("a\nb")))
  }

  test("kmv under-full sketch returns the exact distinct set") {
    KmvSketch.register(spark)
    import spark.implicits._
    val df = spark.range(1000)
      .select(md5((col("id") % 10).cast("string")).as("h"))
    val s = df.agg(KmvSketch(col("h")).as("s"))
      .select(size(col("s")).as("n"), Sketches.kmvEstimate(col("s"), KmvSketch.DefaultK).as("est"))
      .head()
    assert(s.getInt(0) == 10 && s.getDouble(1) == 10.0)
  }

  test("GraftExtensions injects all engine functions into plain SQL") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_simhash64(array('a', 'b')) AS s,
        |       (SELECT size(graft_kmv_sketch(md5(CAST(id AS STRING))))
        |        FROM range(10)) AS k,
        |       (SELECT graft_kll_quantiles(CAST(id AS DOUBLE))[2]
        |        FROM range(1, 101)) AS q""".stripMargin).head()
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Long]("s") != 0L)
    assert(r.getAs[Int]("k") == 10)
    assert(r.getAs[Double]("q") == 50.0) // exact p50 under capacity
  }

  test("kmv estimate lands within 40% of the true distinct count") {
    val row = Sketches.kmvDistinct(spark, sfDir).head()
    val exact = row.getAs[Long]("n_exact").toDouble
    val est = row.getAs[Double]("kmv_estimate")
    assert(math.abs(est - exact) / exact < 0.4, s"est=$est exact=$exact")
  }

  test("hll estimate lands within 40% and its integer core is consistent") {
    val row = Sketches.hllDistinct(spark, sfDir).head()
    val exact = row.getAs[Long]("n_exact").toDouble
    val est = row.getAs[Double]("hll_estimate")
    // m=64 → standard error ≈ 1.04/√64 ≈ 13%; 40% is a loose pin that
    // still catches a broken rank/bucket computation outright
    assert(math.abs(est - exact) / exact < 0.4, s"est=$est exact=$exact")
    // the exact-integer core: harmonic sum covers all 64 registers, and
    // empty registers contribute exactly 2^55 each
    val (vZero, sInt) = (row.getAs[Long]("v_zero"), row.getAs[Long]("s_int"))
    assert(vZero >= 0 && sInt >= (1L << 55) * vZero && sInt <= 64L * (1L << 55))
    // bit-determinism: the register state is integer and mergeable, so a
    // full re-execution (fresh shuffles, different task interleavings)
    // must reproduce the identical row — the property the oracle gate
    // relies on and a double-harmonic-sum HLL would not have
    val again = Sketches.hllDistinct(spark, sfDir).head()
    assert(row == again, "hll row must be bit-deterministic across runs")
  }

  test("kll buffer: exact under capacity, rank-bounded on adversarial sorted input") {
    import graft.functions.KllSketch
    // under capacity nothing compacts → quantiles are the exact
    // smallest-value-reaching-ceil(p·n) order statistics
    val small = new KllSketch.Buffer
    (1 to 100).foreach(v => small.insert(v.toDouble, 4096))
    assert(small.quantiles(Seq(0.5, 0.99)) == Seq(50.0, 99.0))
    // serde roundtrip preserves the ladder bit-for-bit
    val back = KllSketch.Buffer.fromBytes(small.toBytes)
    assert(back.quantiles(Seq(0.5, 0.99)) == Seq(50.0, 99.0))
    // 200k SORTED inserts (worst case for compactors: every compaction
    // perturbs a contiguous rank range) through tree-merged partials,
    // mimicking partial aggregation: 20 buffers of 10k merged pairwise
    val capacity = 4096
    val partials = (0 until 20).map { b =>
      val buf = new KllSketch.Buffer
      (0 until 10000).foreach(i => buf.insert((b * 10000 + i).toDouble, capacity))
      buf
    }
    val merged = partials.reduce { (a, b) => a.mergeIn(b, capacity); a }
    val n = 200000.0
    for ((p, est) <- KllSketch.DefaultPs.zip(merged.quantiles(KllSketch.DefaultPs))) {
      val trueRank = est / n // values are 0..n-1, so rank(v) = v + 1 ≈ v
      assert(math.abs(trueRank - p) <= 0.02,
        s"p=$p: estimate $est has rank error ${math.abs(trueRank - p)}")
    }
  }

  test("kll driver query: every rank bound holds, exact quantiles monotone") {
    val rows = Sketches.kllQuantileBound(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length % 6 == 0)
    assert(rows.forall(_.getAs[Boolean]("rank_within_2pct")),
      "every sketch estimate must sit within the 2% rank gate")
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val qs = g.sortBy(_.getAs[Long]("p_pct")).map(_.getAs[Double]("exact_value"))
      assert(qs.sameElements(qs.sorted), "exact quantiles must be monotone in p")
    }
  }

  test("count-min: distributed sketch bit-matches a local replay; bounds hold") {
    import graft.functions.CmSketch
    import org.apache.spark.sql.functions._
    CmSketch.register(spark)
    val toks = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(explode(graft.functions.TextOps.tokens).as("t"))
      .filter(length(col("t")) > 0)
    // distributed sketch (map-side combine + merges) vs a sequential
    // local replay of the identical hash chain
    val got = toks.agg(CmSketch(col("t")).as("sk"))
      .head().getSeq[Long](0).toArray
    val want = new Array[Long](CmSketch.Depth * CmSketch.Width)
    val local = toks.collect().map(_.getString(0))
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    local.foreach { t =>
      val s = UTF8String.fromString(t)
      (0 until CmSketch.Depth).foreach { d =>
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, XXH64.hashInt(d, 42L))
        want(d * CmSketch.Width +
          java.lang.Math.floorMod(h, CmSketch.Width.toLong).toInt) += 1L
      }
    }
    assert(got.sameElements(want), "merge order must not change the counters")
    // driver query: both CM guarantees verified in-engine for the top-20
    val rows = Sketches.cmFrequencyBound(spark, sfDir).collect()
    assert(rows.length == 20 || rows.length == local.distinct.length.min(20))
    assert(rows.forall(_.getAs[Boolean]("overest_ok")),
      "CM estimates can never undercount")
    assert(rows.forall(_.getAs[Boolean]("bound_ok")),
      "every estimate must sit within the 3N/width gate")
  }
}
