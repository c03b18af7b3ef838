package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized properties of the changelog algebra (SURVEY §5): for random
  * delete subsets and random batchings, the incremental pipeline must land
  * exactly where batch evaluation of the net rows lands. Uses ScalaCheck
  * generators sampled under fixed seeds (the scalatest bridge artifact is
  * not available offline), so failures replay deterministically.
  */
class ZSetPropertySpec extends SparkSpec {

  private lazy val insertLines =
    Changelog.generate(spark, sfDir, insertOnly = true)
      .orderBy("t", "sub", "idx").select("line").collect().map(_.getString(0)).toSeq

  private def stateOf(batches: Seq[Seq[String]]): IncrementalQ3.State = {
    import spark.implicits._
    batches.foldLeft(IncrementalQ3.init(spark)) { (st, lines) =>
      IncrementalQ3.step(st, lines.toDF("line"))
    }
  }

  private def aggRows(st: IncrementalQ3.State): Seq[Seq[Any]] =
    st.agg.orderBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .collect().map(_.toSeq).toSeq

  test("property: insert S, delete random D ⊆ S (any batching) ≡ insert S \\ D") {
    val trial = for {
      delFrac <- Gen.choose(0.1, 0.9)
      nBatches <- Gen.choose(1, 4)
    } yield (delFrac, nBatches)
    (1 to 4).foreach { i =>
      val (delFrac, nBatches) =
        trial.pureApply(Gen.Parameters.default, Seed(42L + i))
      val rnd = new scala.util.Random(1000L + i)
      val deleted = insertLines.filter(_ => rnd.nextDouble() < delFrac)
      val deleteLines = deleted.map(l => "-" + l.substring(1))
      val keptOnly = stateOf(Seq(insertLines.diff(deleted)))
      val delBatches =
        deleteLines.grouped(math.max(1, deleteLines.length / nBatches)).toSeq
      val streamed = stateOf(insertLines +: delBatches)
      assert(aggRows(streamed) == aggRows(keptOnly),
        s"trial $i (delFrac=$delFrac, nBatches=$nBatches) diverged")
    }
  }

  test("property: deltaJoin satisfies Δ(A⋈B) = (A∪ΔA)⋈(B∪ΔB) − A⋈B") {
    // the defining equation of the bilinear delta rule, pinned directly on
    // random signed multisets (weights in ±1..±3, duplicate keys, keys
    // private to one side) — independent of the Q3 fold above
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def zset(rnd: scala.util.Random, n: Int, tag: String) =
      Seq.fill(n)((rnd.nextInt(6).toLong,
          (rnd.nextInt(5) - 2).toLong match { case 0L => 1L; case w => w }))
        .map { case (k, w) => (k, w) }
        .toDF(s"${tag}_k", ZSet.W)
    (1 to 3).foreach { i =>
      val rnd = new scala.util.Random(77L + i)
      val (a, da) = (zset(rnd, 8, "a"), zset(rnd, 5, "a"))
      val (b, db) = (zset(rnd, 8, "b"), zset(rnd, 5, "b"))
      val cond = col("a_k") === col("b_k")
      def rows(df: org.apache.spark.sql.DataFrame) =
        ZSet.consolidate(df).orderBy("a_k", "b_k")
          .collect().map(_.toSeq).toSeq
      val delta = rows(ZSet.deltaJoin(a, da, b, db, cond))
      val negAB = ZSet.join(a, b, cond)
        .withColumn(ZSet.W, -col(ZSet.W))
      val defining = rows(
        ZSet.join(a.unionByName(da), b.unionByName(db), cond)
          .unionByName(negAB))
      assert(delta == defining, s"trial $i: bilinear delta rule violated")
    }
  }
}
