package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, col, concat, count, length, lit, md5, round, sum, when}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(text)` — Unicode NFC normalization as a native codegen
  * expression.
  *
  * Spark ships no normalization function, yet a multilingual corpus mixes
  * precomposed ('é', U+00E9) and decomposed ('e'+U+0301) spellings of the
  * same grapheme, which breaks exact dedup, tokenization, and any
  * hash-keyed join on text. Normalizing is the canonical first pass of a
  * training-data pipeline, so it belongs in the engine as a first-class
  * expression (stays inside whole-stage codegen) rather than a UDF.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_nfc"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  // called from generated code — keep the (UTF8String) => UTF8String shape.
  // Fast path: Normalizer.isNormalized is a cheap scan, and real corpora
  // are overwhelmingly already-NFC, so most rows skip the rewrite alloc.
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = call_function("graft_nfc", c)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")

  /** The `text_normalize` query: corpus-wide normalization audit. The
    * fixtures are pure ASCII (already NFC), so the query SEEDS each doc
    * with a decomposed suffix (e/n + combining marks, U+0301/U+0303) the
    * oracle seeds identically via `chr()`; NFC must recompose it, shrink
    * the code-point count by exactly 2 per doc, and match DuckDB's
    * `nfc_normalize` md5-for-md5.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    register(spark)
    // " cafe" + COMBINING ACUTE + " nin" + COMBINING TILDE + "o"
    val seeded = concat(col("text"), lit(" cafe\u0301 nin\u0303o"))
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), seeded.as("raw"), NfcNormalize(seeded).as("norm"))
      .select(
        count(lit(1)).as("n_docs"),
        sum(length(col("raw"))).cast("long").as("raw_cp"),
        sum(length(col("norm"))).cast("long").as("norm_cp"),
        sum(when(col("norm") =!= col("raw"), 1L).otherwise(0L)).as("n_changed"),
        // order-independent content checksum: Σ (md5-prefix mod 1e9) per
        // normalized doc — the modulus keeps the BIGINT sum overflow-free
        // on both engines (DuckDB raises on CAST overflow; Spark wraps)
        sum(org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(md5(col("norm")), 1, 15), 16, 10)
          .cast("long") % 1000000000L).as("content_sum"))
  }
}
