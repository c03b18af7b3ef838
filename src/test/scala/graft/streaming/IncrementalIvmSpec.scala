package graft.streaming

import graft.SparkSpec
import graft.operators.Relational

/** The query-parametric fold (IncrementalIvm): each converged incremental
  * answer must equal its batch query EXACTLY, and the ± cycle must cancel
  * to exactly empty — at sf0.001, against the in-process batch plans (the
  * driver re-checks both against DuckDB at sf0.01).
  */
class IncrementalIvmSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toIndexedSeq.map(_.toSeq.map {
      case d: java.math.BigDecimal => d.doubleValue()
      case x => x
    })

  test("incremental Q10 converges to the batch Q10 answer exactly") {
    val inc = rows(IvmQueries.q10Incremental(spark, sfDir))
    val batch = rows(Relational.q10Returned(spark, sfDir)
      .selectExpr("CAST(c_custkey AS BIGINT) AS c_custkey", "c_name", "n_name",
        "revenue", "n_returned"))
    assert(inc.nonEmpty, "empty Q10 result at sf0.001")
    assert(inc == batch)
  }

  test("incremental Q5 converges to the batch Q5 answer exactly") {
    val inc = rows(IvmQueries.q5Incremental(spark, sfDir))
    val batch = rows(Relational.q5LocalSupplier(spark, sfDir))
    assert(inc.nonEmpty, "empty Q5 result at sf0.001")
    assert(inc == batch)
  }

  test("live Q10: the same fold under Structured Streaming equals batch Q10") {
    val live = rows(IvmQueries.q10Live(spark, sfDir))
    val batch = rows(Relational.q10Returned(spark, sfDir)
      .selectExpr("CAST(c_custkey AS BIGINT) AS c_custkey", "c_name", "n_name",
        "revenue", "n_returned"))
    assert(live == batch)
  }

  test("incremental Q1 (agg-only member) equals the batch Q1 exactly") {
    val inc = rows(IvmQueries.q1Incremental(spark, sfDir))
    val batch = rows(Relational.q1Pricing(spark, sfDir))
    assert(inc.nonEmpty, "empty Q1 result at sf0.001")
    assert(inc == batch)
  }

  test("Q5 full ± cycle cancels to exactly empty through the parametric fold") {
    val out = IvmQueries.q5IncrementalCycle(spark, sfDir)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("n_name", "revenue", "n_lines"))
  }

  test("mid-fold state is a consistent prefix view (batch 1 of 3 is a plain subset)") {
    // After one of three insert-only batches the maintained Q10 aggregate
    // must itself be a valid aggregate of SOME event-time prefix: every
    // (customer, revenue, cnt) it reports is reproducible from the raw
    // tables restricted to the orders whose keys appear in the state.
    val events = Changelog.generateCached(spark, sfDir, insertOnly = true)
    val spec = IvmQueriesTestHook.q10SpecForTest
    val tMax = events.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("t"))).head().getLong(0)
    val b0 = events.filter(s"CAST(((t - 1) * 3) DIV $tMax AS INT) = 0")
      .select("line")
    val st = IncrementalIvm.step(IncrementalIvm.init(spark, spec), b0, spec)
    // state invariants: all weights are positive (insert-only), agg cnt > 0
    assert(st.c.filter(s"${ZSet.W} <= 0").isEmpty)
    assert(st.agg.filter("cnt <= 0").isEmpty)
    // the co state joins back consistently: every co row's order exists in o
    val orphans = st.co.join(st.o,
      st.co("o_orderkey") === st.o("o_orderkey"), "left_anti")
    assert(orphans.isEmpty)
  }
}

/** Test-only access to the private specs (kept private in prod code — the
  * driver surface is the two query functions).
  */
object IvmQueriesTestHook {
  def q10SpecForTest: IncrementalIvm.IvmSpec = {
    import org.apache.spark.sql.functions._
    IncrementalIvm.IvmSpec(
      dC = p => Changelog.customers(p).select(col("c_custkey"), col(ZSet.W)),
      dO = p => Changelog.orders(p)
        .filter(col("o_orderdate") >= to_date(lit("1996-01-01")) &&
          col("o_orderdate") < to_date(lit("1996-04-01")))
        .select(col("o_orderkey"), col("o_custkey"), col(ZSet.W)),
      dL = p => Changelog.lineitems(p)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(38,4)").as("revenue"), col(ZSet.W)),
      coCond = col("c_custkey") === col("o_custkey"),
      coCols = Seq("o_orderkey", "c_custkey"),
      colCond = col("o_orderkey") === col("l_orderkey"),
      aggKeys = Seq("c_custkey"))
  }
}
