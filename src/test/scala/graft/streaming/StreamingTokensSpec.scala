package graft.streaming

import graft.SparkSpec

/** The streaming heavy-hitters contract: batching-invariant and equal to
  * the batch sketch+verify operator — both equalities, because the final
  * verify stage is exact and the MG merge only nominates candidates.
  */
class StreamingTokensSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): List[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toList

  test("streaming MG merge + exact verify equals the batch heavy hitters") {
    val batch = rows(graft.functions.TextOps.frequentTokens(spark, sfDir))
    val fine = rows(StreamingTokens.streamFrequentTokens(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingTokens.streamFrequentTokens(spark, sfDir, maxFilesPerTrigger = 3))
    assert(fine == batch, "1-file batches must reproduce the batch top-20")
    assert(coarse == batch, "3-file batches must too — merge-tree invariance")
    assert(batch.length == 20)
  }

  test("a starved capacity fails the completeness gate instead of lying") {
    val e = intercept[IllegalArgumentException] {
      StreamingTokens.streamFrequentTokens(spark, sfDir,
        maxFilesPerTrigger = 1, capacity = 2)
    }
    assert(e.getMessage.contains("recall bound"))
  }
}
