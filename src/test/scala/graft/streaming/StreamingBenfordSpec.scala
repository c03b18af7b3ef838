package graft.streaming

import graft.SparkSpec

class StreamingBenfordSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): List[Seq[Any]] =
    df.collect().map(_.toSeq).toList

  test("streaming benford accumulation equals the batch screen bit for bit") {
    val batch = rows(graft.operators.Profiling.profileBenford(spark, sfDir))
    val fine = rows(StreamingBenford.streamBenford(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingBenford.streamBenford(spark, sfDir, maxFilesPerTrigger = 3))
    assert(fine == batch, "1-file batches must reproduce the batch screen")
    assert(coarse == batch, "3-file batches must too — batching invariance")
    assert(batch.nonEmpty)
  }
}
