package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational

class BloomFilterSpec extends SparkSpec {

  test("no false negatives: every inserted key probes true") {
    val words = new Array[Long](1 << 10) // 65536 bits
    val keys = (0L until 1000L).map(i => i * 2654435761L)
    keys.foreach(BloomFilterOps.add(words, _, 5))
    val bytes = BloomFilterOps.toBytes(words, 5)
    assert(keys.forall(BloomFilterOps.mightContain(bytes, _)))
  }

  test("false positives are rare at the design load") {
    val words = new Array[Long]((1 << 20) / 64)
    (0L until 50000L).foreach(i => BloomFilterOps.add(words, i, 5))
    val bytes = BloomFilterOps.toBytes(words, 5)
    // probe 50k keys NOT inserted; fp ≈ 3e-5 at 20 bits/key, so a 100×
    // margin still rounds to "a handful"
    val fps = (1000000L until 1050000L).count(BloomFilterOps.mightContain(bytes, _))
    assert(fps < 50, s"false-positive count $fps out of 50000 probes")
  }

  test("distributed build: partial bitsets OR-merge to the single-node filter") {
    BloomFilter.register(spark)
    import spark.implicits._
    val df = spark.range(0, 10000, 1, 8).select(col("id")) // 8 partitions → 8 partials
    val distributed = df.agg(BloomFilter.bloomAgg(col("id"))).head().getAs[Array[Byte]](0)
    val local = {
      val w = new Array[Long](BloomFilterOps.DefaultBits / 64)
      (0L until 10000L).foreach(BloomFilterOps.add(w, _, BloomFilterOps.DefaultHashes))
      BloomFilterOps.toBytes(w, BloomFilterOps.DefaultHashes)
    }
    assert(java.util.Arrays.equals(distributed, local))
  }

  test("bloom-pruned join equals the plain filtered join") {
    val pruned = Relational.joinBloomPruned(spark, sfDir).collect()
    val plain = {
      val o = graft.sources.Tables.table(spark, sfDir, "orders")
        .filter(col("o_orderdate") < lit("1996-01-01"))
      graft.sources.Tables.table(spark, sfDir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(Relational.revenueExpr).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority")).collect()
    }
    assert(pruned.toSeq == plain.toSeq)
  }
}
