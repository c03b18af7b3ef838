package graft.streaming

import graft.SparkSpec

/** The incremental-CEP contract: batching-invariant (ordered-slice folds
  * compose) and bit-equal to the batch pattern operator.
  */
class StreamingPatternSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): List[Seq[Any]] =
    df.collect().map(_.toSeq).toList

  test("streaming per-user automaton equals the batch pattern match") {
    val batch = rows(graft.operators.Temporal.patternMatch(spark, sfDir))
    val fine = rows(StreamingPattern.streamPatternMatch(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingPattern.streamPatternMatch(spark, sfDir, maxFilesPerTrigger = 3))
    assert(fine == batch, "1-slice batches must reproduce the batch counts")
    assert(coarse == batch, "3-slice batches must too — fold composition")
    assert(batch.nonEmpty)
  }
}
