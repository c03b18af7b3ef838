package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed `Dataset[T]` realization of Q3 — the case-class/Encoder surface
  * of the engine (brief: "Use Dataset[T] with case-class Encoders where
  * type safety helps"). Same Catalyst plan underneath: `joinWith` is an
  * equi-join (broadcast/shuffle chosen by size), `groupByKey.agg` is
  * partial/final aggregation over a typed [[Aggregator]].
  *
  * Deliberate trade recorded here: the per-row FILTERS stay as Column
  * predicates even in the typed pipeline — a closure filter
  * (`.filter(_.c_mktsegment == "BUILDING")`) is opaque to Catalyst and
  * would kill parquet pushdown, which at 100 TB is the difference between
  * scanning a partition and scanning the lake. Types guard the shapes;
  * expressions carry the predicates.
  *
  * Revenue aggregates through an exact-decimal typed Aggregator (the
  * reference's double state drifts, no_websocket.java:546–550; a typed
  * Double sum would too), so the typed path is bit-equal to the oracle.
  */
object Typed {

  final case class Customer(c_custkey: Long)
  final case class Order(o_orderkey: Long, o_custkey: Long,
                         o_orderdate: String, o_orderpriority: String)
  final case class LineItem(l_orderkey: Long, revenue: java.math.BigDecimal)

  /** Group key — (orderkey, orderdate, priority). */
  final case class Q3Key(l_orderkey: Long, o_orderdate: String, o_orderpriority: String)

  /** Exact-decimal SUM as a typed Aggregator: buffer is BigDecimal, so
    * partial/merge order cannot change the result.
    */
  private object RevenueSum
      extends Aggregator[(Q3Key, java.math.BigDecimal), java.math.BigDecimal, Double] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: (Q3Key, java.math.BigDecimal)) =
      b.add(a._2)
    override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal) = a.add(b)
    override def finish(b: java.math.BigDecimal): Double = b.doubleValue()
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def q3Typed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = Relational.Q3Date // ISO yyyy-MM-dd: string order = date order

    val c: Dataset[Customer] = Tables.table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .as[Customer]
    val o: Dataset[Order] = Tables.table(spark, dir, "orders")
      .filter(to_date(col("o_orderdate")) < to_date(lit(cutoff)))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("string").as("o_orderdate"), col("o_orderpriority"))
      .as[Order]
    val l: Dataset[LineItem] = Tables.table(spark, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) > to_date(lit(cutoff)))
      .select(col("l_orderkey"),
        Relational.revenueExpr.cast("decimal(38,18)").as("revenue"))
      .as[LineItem]

    val co: Dataset[Order] = c.joinWith(o, c("c_custkey") === o("o_custkey"))
      .map(_._2)
    val keyed = co.joinWith(l, co("o_orderkey") === l("l_orderkey"))
      .map { case (ord, li) =>
        (Q3Key(ord.o_orderkey, ord.o_orderdate, ord.o_orderpriority), li.revenue)
      }

    keyed.groupByKey(_._1)
      .agg(RevenueSum.toColumn.name("revenue"))
      .map { case (k, rev) => (k.l_orderkey, k.o_orderdate, k.o_orderpriority, rev) }
      .toDF("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
      // the key carried the date as an ISO string (string Encoders are the
      // simple exact path); restore the fixture's TIMESTAMP type so this
      // query's output schema is byte-identical to q3_batch's
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(20)
  }
}
