package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class TopKPerGroupSpec extends SparkSpec {

  private def orders = Tables.table(spark, sfDir, "orders")
    .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))

  test("heap operator reproduces the window spelling exactly") {
    val got = TopKPerGroup.topKPerGroup(orders, Seq("o_orderpriority"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .collect().map(_.toSeq).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("plans as partial+final heaps with a group-keyed exchange, no sort, no window") {
    val df = TopKPerGroup.topKPerGroup(orders, Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // nodeName drops the Exec suffix; partial flag prints as the trailing
    // boolean — demand one partial and one final heap node
    assert("TopKPerGroup \\[.*, true".r.findFirstIn(plan).isDefined &&
      "TopKPerGroup \\[.*, false".r.findFirstIn(plan).isDefined,
      s"expected partial and final heap nodes:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"),
      s"the exchange must be keyed by the group columns:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("SortExec"),
      s"the heap path must not sort or window:\n$plan")
  }

  test("partial pass bounds the shuffle: at most partitions x groups x k rows cross") {
    val k = 2
    val many = orders.repartition(8)
    val df = TopKPerGroup.topKPerGroup(many, Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k)
    val nGroups = orders.select(col("o_orderpriority")).distinct().count()
    // execute df's own plan (count() would execute a different one and
    // leave df's metrics untouched)
    assert(df.collect().length == nGroups * k) // every class has ≥ k orders
    // the partial stage's emission bound, computed directly: per input
    // partition, each group forwards at most k rows
    val partialCount = many.mapPartitions { it =>
      Iterator.single(it.map(_.getString(0)).toSeq.groupBy(identity)
        .map { case (_, v) => math.min(v.size, k) }.sum)
    }(org.apache.spark.sql.Encoders.scalaInt).collect().map(_.toLong).sum
    assert(partialCount <= 8 * nGroups * k && partialCount < orders.count(),
      s"partial must emit ≤ ${8 * nGroups * k} and fewer than the input")
    // the operator's own metrics agree: the partial node emitted exactly
    // the bound computed above, the final node exactly groups·k
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE hides materialized stages behind leaf QueryStageExec nodes —
    // recurse through them to reach the physical operators
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val execs = allNodes(df.queryExecution.executedPlan)
      .collect { case e: TopKPerGroupExec => e }
    assert(execs.size == 2, s"expected both heap nodes, got ${execs.size}")
    val byPhase = execs.map(e => e.partial -> e.metrics).toMap
    assert(byPhase(true)("numOutputRows").value == partialCount)
    assert(byPhase(false)("numOutputRows").value == nGroups * k)
    assert(byPhase(false)("numGroups").value == nGroups)
  }

  test("ties and small groups: k larger than a group returns the whole group") {
    import spark.implicits._
    val tiny = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("b", 3L, 1.0))
      .toDF("g", "id", "v")
    val got = TopKPerGroup.topKPerGroup(tiny, Seq("g"),
        Seq(("v", true), ("id", false)), 10)
      .collect().map(_.toSeq).toSet
    assert(got == tiny.collect().map(_.toSeq).toSet)
    // equal v: id ascending decides the single slot
    val one = TopKPerGroup.topKPerGroup(tiny.filter(col("g") === "a"),
      Seq("g"), Seq(("v", true), ("id", false)), 1).collect()
    assert(one.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("bounded memory: high-cardinality groups stay exact past the heap-map cap") {
    // o_orderkey is a unique key → every row its own group, the worst case
    // the r5 ADVICE flagged (doc_id-grouped top-k). With the cap forced far
    // below the group count, the partial node must flush in chunks and the
    // final node must degrade to the external-sort path — and the answer
    // must STILL equal the window spelling bit for bit.
    val lineitem = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    withSQLConf("spark.graft.topk.maxGroupsInMemory" -> "7") {
      val df = TopKPerGroup.topKPerGroup(lineitem, Seq("l_orderkey"),
        Seq(("l_quantity", true), ("l_linenumber", false)), 2)
      val got = df.collect().map(_.toSeq).toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_quantity").desc, col("l_linenumber"))
      val want = lineitem.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
      // the final node must actually have taken the sort-fallback path
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec => q +: allNodes(q.plan)
        case other => other +: other.children.flatMap(allNodes)
      }
      val execs = allNodes(df.queryExecution.executedPlan)
        .collect { case e: TopKPerGroupExec => e }
      val fin = execs.find(!_.partial).get
      assert(fin.metrics("numSortFallbacks").value > 0,
        "the cap was breached, so at least one partition must report a fallback")
    }
  }

  test("float group keys: -0.0/0.0 and NaN are one group on both code paths") {
    // ADVICE r6: the strategy normalizes group keys exactly as Aggregate
    // planning does (-0.0 → 0.0, NaN → canonical NaN), so the hash-heap
    // map, the exchange, and the sort-fallback boundary all agree with
    // ordering equality. Both -0.0 and 0.0 rows must land in ONE group
    // (same as the window spelling, which Spark normalizes too).
    import spark.implicits._
    val nanA = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val rows = Seq((0.0, 1L), (-0.0, 2L), (-0.0, 3L),
      (Double.NaN, 4L), (nanA, 5L), (1.5, 6L)).toDF("g", "id")
    // compare by RAW key bits + id: Scala's == on boxed doubles says
    // NaN != NaN, and we also want to assert output rows keep their
    // ORIGINAL bytes (normalization lives only in key space)
    def run(): Set[(Long, Long)] =
      TopKPerGroup.topKPerGroup(rows, Seq("g"), Seq(("id", false)), 2)
        .collect().map(r =>
          (java.lang.Double.doubleToRawLongBits(r.getDouble(0)), r.getLong(1)))
        .toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    val want = rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").collect().map(r =>
        (java.lang.Double.doubleToRawLongBits(r.getDouble(0)), r.getLong(1)))
      .toSet
    assert(run() == want, "hash-heap path must normalize float keys")
    // ids kept: zero-group {1,2}, NaN-group {4,5}, lone 6 — five rows
    assert(run().map(_._2) == Set(1L, 2L, 4L, 5L, 6L))
    withSQLConf("spark.graft.topk.maxGroupsInMemory" -> "1") {
      assert(run() == want, "sort-fallback path must agree")
    }
  }

  test("misconfigured maxGroupsInMemory fails fast instead of dropping rows") {
    withSQLConf("spark.graft.topk.maxGroupsInMemory" -> "0") {
      val df = TopKPerGroup.topKPerGroup(orders, Seq("o_orderpriority"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 1)
      val e = intercept[Exception] { df.collect() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t =>
        Option(t.getMessage).exists(_.contains("maxGroupsInMemory"))),
        s"expected the conf-validation message, got: $e")
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
