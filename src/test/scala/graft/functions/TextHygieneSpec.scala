package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextHygieneSpec extends SparkSpec {

  private val Composed = "caf\u00e9"   // e-acute precomposed
  private val Decomposed = "cafe\u0301" // e + combining acute

  test("graft_nfc recomposes decomposed sequences and is idempotent") {
    NfcNormalize.register(spark)
    import spark.implicits._
    val rows = Seq(Composed, Decomposed, "plain ascii", "nin\u0303o")
      .toDF("s")
      .select(col("s"), NfcNormalize(col("s")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows(Composed) == Composed)
    assert(rows(Decomposed) == Composed)
    assert(rows("plain ascii") == "plain ascii")
    assert(rows("nin\u0303o") == "ni\u00f1o")
    // idempotent: normalizing the normalized output is the identity
    val twice = Seq(Decomposed).toDF("s")
      .select(NfcNormalize(NfcNormalize(col("s"))).as("n")).head.getString(0)
    assert(twice == Composed)
  }

  test("redactPii scrubs every seeded pattern") {
    val out = TextOps.redactPii(spark, sfDir)
    // the seed plants exactly one of each per doc; none may survive
    assert(out.filter(col("n_emails") =!= 1 || col("n_ips") =!= 1 ||
      col("n_phones") =!= 1).count() == 0)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    assert(out.count() == docs.count())
  }

  test("textRepetition bounds and the single-token edge") {
    val rep = TextOps.textRepetition(spark, sfDir)
    assert(rep.filter(
      col("top_token_frac") <= 0 || col("top_token_frac") > 1 ||
      col("dup_bigram_frac") < 0 || col("dup_bigram_frac") >= 1).count() == 0)
    // word-salad fixture: repeated vocab means SOME doc repeats a bigram
    assert(rep.filter(col("dup_bigram_frac") > 0).count() > 0)
  }
}
