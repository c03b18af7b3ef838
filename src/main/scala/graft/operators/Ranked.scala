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

  /** Append a 1-based global rank over `order` as column `idxCol`.
    *
    * Stays entirely in Tungsten (r14, guide §1.4/§4.1 — the old
    * `.rdd.zipWithIndex` + `createDataFrame` hop decoded every row to an
    * external `Row` and re-encoded it, TWICE: once in zipWithIndex's count
    * job and once in the consuming job; measured 30 s of task time just
    * for the lineitem count pass at sf0.1). Now: range-partition + sort
    * once, stamp `monotonically_increasing_id` — whose contract is
    * `(partitionId << 33) | consecutive-record-number` — checkpoint that
    * single materialization, derive per-partition counts with a codegen'd
    * aggregate over the cached blocks, and compute the global rank as
    * `offset(partition) + local + 1` with a literal offset array. Same
    * total order, same tie semantics (scan order within equal keys), no
    * external-row boundary anywhere.
    */
  def globalRank(df: DataFrame, order: Seq[Column],
                 idxCol: String = "idx"): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // collision-free temp name: a caller's own column must not be clobbered
    val m = Iterator.from(0).map(i => s"__graft_gr$i")
      .find(c => !df.columns.contains(c)).get
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(m, monotonically_increasing_id())
      .localCheckpoint() // ONE materialization: the counts job and every
                         // downstream consumer read these blocks
    def pid = shiftrightunsigned(col(m), 33).cast("int")
    val counts = sorted.groupBy(pid.as("p")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((a, i) => a + counts.getOrElse(i, 0L))
    val offset = element_at(array(offsets.take(n).map(lit): _*), pid + lit(1))
    sorted.withColumn(idxCol,
        offset + col(m).bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop(m)
  }

  /** Append a 1-based PER-STRATUM rank (`row_number() OVER (PARTITION BY
    * strata ORDER BY order)`) as column `idxCol` — the scale-safe
    * replacement for a stratum-partitioned window when one stratum
    * dominates: `Window.partitionBy(source)` sorts each stratum inside ONE
    * task, so a 90%-of-corpus source serializes into a single partition's
    * sort. Here the input is range-partitioned on `strata ++ order` — a
    * dominant stratum simply spans several contiguous partitions — and the
    * global per-stratum rank is recovered by shifting each partition's
    * local counts by the preceding partitions' per-stratum totals (one
    * lightweight counts job, exactly [[runningSum]]'s two-pass shape).
    *
    * Driver/task state is O(#strata × #partitions) — sized for mixture-
    * recipe strata (tens of sources), not high-cardinality keys (those
    * don't skew, use the window). Ties on `order` take scan order; callers
    * that need determinism must order by a key-complete column set.
    */
  def stratifiedRank(df: DataFrame, strata: Seq[Column], order: Seq[Column],
                     idxCol: String = "idx"): DataFrame = {
    require(!df.columns.contains(idxCol),
      s"stratifiedRank: output column '$idxCol' already exists in the input")
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // the stratum key as one struct column, so both RDD passes read it
    // positionally (collision-free temp name)
    val s = Iterator.from(0).map(i => s"__graft_sr$i")
      .find(c => !df.columns.contains(c)).get
    val keys = strata ++ order
    // checkpoint: both passes must see one materialization of the sort
    val sorted = df.withColumn(s, org.apache.spark.sql.functions.struct(strata: _*))
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .localCheckpoint()
    val sIdx = sorted.schema.fieldIndex(s)
    val partials = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.HashMap.empty[Row, Long]
      it.foreach { r =>
        val k = r.getStruct(sIdx)
        m.update(k, m.getOrElse(k, 0L) + 1L)
      }
      Iterator((i, m.toMap))
    }.collect().sortBy(_._1).map(_._2)
    // offsets(i)(stratum) = rows of that stratum in partitions < i
    val offsets: Array[Map[Row, Long]] =
      partials.scanLeft(Map.empty[Row, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, 0L) + v) }
      }.dropRight(1)
    val schema = sorted.schema.add(idxCol, LongType, nullable = false)
    val withIdx = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val ctr = scala.collection.mutable.HashMap.empty[Row, Long]
      offsets(i).foreach { case (k, v) => ctr.update(k, v) }
      it.map { r =>
        val k = r.getStruct(sIdx)
        val rk = ctr.getOrElse(k, 0L) + 1L
        ctr.update(k, rk)
        Row.fromSeq(r.toSeq :+ rk)
      }
    }
    spark.createDataFrame(withIdx, schema).drop(s)
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
