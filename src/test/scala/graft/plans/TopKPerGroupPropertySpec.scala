package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

/** Property coverage for [[TopKPerGroup]]: over adversarial domains — null
  * group keys, null order values (Descending ⇒ NULLS LAST, same as the
  * window spelling's `desc`), heavy ties resolved only by the tie-break
  * column, one giant group among singletons, k below/at/above group sizes,
  * multi-column grouping — the heap operator must reproduce the
  * `row_number() <= k` window spelling's multiset EXACTLY for every k.
  */
class TopKPerGroupPropertySpec extends SparkSpec
    with TableDrivenPropertyChecks {

  private def domain = {
    import spark.implicits._
    (0 until 2000).map { i =>
      val g: java.lang.Long =
        if (i % 29 == 0) null
        else if (i % 5 == 0) 0L // one giant group
        else i * 7919L % 97L
      val v: java.lang.Long =
        if (i % 31 == 0) null else (i * 104729L % 50L) - 25L // heavy ties
      (g, i % 3, v, i.toLong)
    }.toDF("g", "g2", "v", "id").repartition(7)
  }

  test("heap ≡ window row_number over nulls, ties, skew, multi-col groups, all k") {
    import org.apache.spark.sql.expressions.Window
    val d = domain.localCheckpoint() // one deterministic frame for both paths
    forAll(Table("k", 1, 3, 7, 50)) { k =>
      val got = TopKPerGroup.topKPerGroup(d, Seq("g", "g2"),
          Seq(("v", true), ("id", false)), k)
        .collect().map(_.toSeq)
      val w = Window.partitionBy(col("g"), col("g2"))
        .orderBy(col("v").desc, col("id"))
      val want = d.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq)
      assert(got.length == want.length, s"k=$k row count")
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        want.groupBy(identity).view.mapValues(_.size).toMap,
        s"k=$k multiset equality")
    }
  }

  test("ascending order and single-column grouping agree with the window spelling too") {
    import org.apache.spark.sql.expressions.Window
    val d = domain.localCheckpoint()
    val got = TopKPerGroup.topKPerGroup(d, Seq("g"),
        Seq(("v", false), ("id", false)), 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id"))
    val want = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq)
  }
}
