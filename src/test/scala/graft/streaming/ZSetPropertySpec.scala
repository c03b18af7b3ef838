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
}
