package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema'd ORC source/sink — the third columnar wire format next to
  * parquet and the text formats ([[Csv]], [[Json]]). Same design rules:
  * explicit schema, pruning/pushdown at the scan (ORC carries min/max
  * stripe statistics exactly like parquet row groups, so
  * `PushedFilters` works identically).
  */
object Orc {

  val ddl: Map[String, String] = Map(
    "orders" -> ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, " +
      "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"))

  def read(spark: SparkSession, path: String, table: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl(table))).orc(path)

  /** Stage a fixture table as ORC. */
  def stage(spark: SparkSession, dir: String, table: String, outPath: String): Unit =
    Tables.table(spark, dir, table)
      .selectExpr(StructType.fromDDL(ddl(table)).fieldNames.toIndexedSeq: _*)
      .write.mode("overwrite").orc(outPath)
}
