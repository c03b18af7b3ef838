package graft.functions

import graft.SparkSpec

/** The persisted inverted-index read path: same answer as the in-flight
  * lookup, scored off parquet written `partitionBy(shard)`, with the
  * term predicate reaching the scan as a PUSHED filter (row groups whose
  * term range excludes the query batch never decompress) — the plan
  * property that makes "query the index" viable at corpus scale.
  */
class TextIndexSpec extends SparkSpec {

  test("persisted index lookup ≡ in-flight lookup, term filter pushed to the scan") {
    val persisted = TextOps.indexLookupPersisted(spark, sfDir)
    val got = persisted.collect().map(_.toSeq).toSet
    val want = TextOps.indexLookup(spark, sfDir).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty,
      s"persisted read path diverged: ${got.size} vs ${want.size} rows")
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term IN filter must reach the parquet scan:\n$plan")
  }
}
