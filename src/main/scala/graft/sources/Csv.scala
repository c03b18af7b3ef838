package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema'd CSV/TBL source — the reference's input format (SURVEY §2.1:
  * Flink filesystem CSV connectors, TPCHQuery3SQL_Batch.java:42–95, and
  * the three hand-rolled parse-error-tolerant `SourceFunction` CSV readers,
  * TPCHQuery3_BatchProcessor.java:382–619). Spark's CSV datasource
  * subsumes all of them: explicit schema, configurable delimiter (`|`
  * covers `.tbl`), `DROPMALFORMED` replaces the custom bad-row skipping,
  * and column pruning/pushdown reach the scan.
  */
object Csv {

  /** Fixture-schema DDL per table (TESTDATA.md column sets). */
  val ddl: Map[String, String] = Map(
    "customer" -> ("c_custkey bigint, c_name string, c_nationkey int, " +
      "c_acctbal double, c_mktsegment string"),
    "orders" -> ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, " +
      "o_totalprice double, o_orderdate date, o_orderpriority string"),
    "lineitem" -> ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, " +
      "l_linenumber int, l_quantity double, l_extendedprice double, " +
      "l_discount double, l_tax double, l_returnflag string, " +
      "l_linestatus string, l_shipdate date"))

  def read(spark: SparkSession, path: String, table: String,
           delimiter: String = "|", header: Boolean = false): DataFrame =
    spark.read
      .schema(StructType.fromDDL(ddl(table)))
      .option("delimiter", delimiter)
      .option("header", header)
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", "DROPMALFORMED")
      .csv(path)

  /** Stage a fixture table as pipe-delimited text (the `.tbl` contract):
    * dates as `yyyy-MM-dd`, money as exact 2-decimal text.
    */
  def stage(spark: SparkSession, dir: String, table: String, outPath: String): Unit = {
    val df = Tables.table(spark, dir, table)
    val cols = StructType.fromDDL(ddl(table)).fields.map { f =>
      f.dataType.typeName match {
        case "date"   => date_format(col(f.name), "yyyy-MM-dd").as(f.name)
        case "double" => col(f.name).cast("decimal(18,2)").cast("string").as(f.name)
        case _        => col(f.name).cast("string").as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*).write.mode("overwrite")
      .option("delimiter", "|").csv(outPath)
  }
}
