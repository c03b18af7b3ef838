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
}
