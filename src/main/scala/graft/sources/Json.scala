package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema'd JSONL source/sink. The reference's only JSON surface is its
  * hand-concatenated output message (TPCHQuery3_StreamProcessor.java:
  * 1037–1052); a data engine also needs JSON as an INPUT format — the
  * lingua franca of crawl/annotation corpora feeding a training-data
  * pipeline. Same design rules as [[Csv]]: explicit schema (never
  * inference at scale — a schema inference pass is a full extra read of
  * 100 TB), `DROPMALFORMED` tolerance, pruning/pushdown at the scan.
  */
object Json {

  val ddl: Map[String, String] = Map(
    "documents" -> "doc_id bigint, text string, lang string, source string, n_chars bigint")

  def read(spark: SparkSession, path: String, table: String): DataFrame =
    spark.read
      .schema(StructType.fromDDL(ddl(table)))
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Stage a fixture table as JSONL (one object per line). */
  def stage(spark: SparkSession, dir: String, table: String, outPath: String): Unit =
    Tables.table(spark, dir, table)
      .selectExpr(StructType.fromDDL(ddl(table)).fieldNames.toIndexedSeq: _*)
      .write.mode("overwrite").json(outPath)
}
