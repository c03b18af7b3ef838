package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed total-order ranking — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))`, whose empty window frame is a
  * SINGLE-PARTITION sort of the whole input (the wall every global-rank
  * plan hits at 100×).
  *
  * Range-partition on the ordering keys, sort within partitions, then
  * `zipWithIndex`: partition ranges are globally ordered, so adding the
  * per-partition offsets (one lightweight count job) reproduces exactly
  * the total order a global window would give — with every partition
  * sorting only its own slice. Ties on the ordering keys take scan order;
  * callers that need determinism must order by a key-complete column set.
  */
object Ranked {

  /** Append a 1-based global rank over `order` as column `idxCol`. */
  def globalRank(df: DataFrame, order: Seq[Column],
                 idxCol: String = "idx"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(idxCol, LongType, nullable = false)
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withIdx, schema)
  }

  /** Append the INCLUSIVE running sum of `value` over the `order` total
    * order as column `sumCol` — the scale-safe replacement for
    * `sum(v).over(Window.orderBy(...))` (same single-partition wall as
    * global rank). Two passes over one range-partitioned sort: a
    * lightweight per-partition totals job (numShufflePartitions longs to
    * the driver), then per-partition prefix sums shifted by the
    * partition offsets.
    */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column,
                 sumCol: String = "cum"): DataFrame = {
    require(!df.columns.contains(sumCol),
      s"runningSum: output column '$sumCol' already exists in the input")
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // collision-free temp name: a caller's own '__v' must not be clobbered
    val v = Iterator.from(0).map(i => s"__graft_rs$i")
      .find(c => !df.columns.contains(c)).get
    // checkpoint: both passes must see one materialization of the sort
    val sorted = df.withColumn(v, value.cast("long"))
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val vIdx = sorted.schema.fieldIndex(v)
    // a null value would silently unbox to 0 — reject it loudly instead
    // (checked in the totals pass, which touches every row anyway)
    val partials = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach { r =>
        require(!r.isNullAt(vIdx), "runningSum: null value column")
        s += r.getLong(vIdx)
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(sumCol, LongType, nullable = false)
    val withSum = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = offsets(i)
      it.map { r => s += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ s) }
    }
    spark.createDataFrame(withSum, schema).drop(v)
  }
}
