package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The [[SpillFormat]] CONTRACT, run against BOTH implementations (r11
  * verdict item 3 — "swap in Delta/Iceberg without touching the algebra"
  * is only credible once a second implementation passes the same suite):
  *
  *  - full write → the returned frame and an all-buckets read both equal
  *    the input;
  *  - incremental carry: a write given only the DIRTY buckets' content
  *    must serve the full state (dirty from the new write, clean carried
  *    forward from the previous version);
  *  - dirty-read: `readBuckets` returns exactly the requested buckets'
  *    rows, and an empty/fileless request yields an empty frame with the
  *    pinned schema;
  *  - version-drop survivability: dropping the PREVIOUS version must not
  *    damage content the new version carried forward (hard links hold
  *    inodes; manifests hold references) — the invariant the algebra's
  *    two-version pruning relies on;
  *  - drop removes the version's own content.
  */
class SpillFormatContractSpec extends SparkSpec {

  import spark.implicits._

  private def state1: DataFrame =
    (0L until 500L).map(k => (k, 1L)).toDF("k", ZSet.W)

  private def bucketOfKey(k: Long): Int =
    Seq(k).toDF("k").select(pmod(hash(col("k")), lit(SpillFormat.buckets))
      .cast("int")).head().getInt(0)

  private def rowsOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  for ((label, fmt) <- Seq("parquet" -> BucketedParquetSpill,
                           "mergelog" -> MergeLogSpill)) {

    test(s"[$label] full write: returned frame and all-buckets read equal input") {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-spillfmt-$label-full").toString
      val w = fmt.write(spark, root, 1L, "s", "k", state1, carry = None)
      assert(rowsOf(w) == rowsOf(state1))
      val all = fmt.readBuckets(spark, root, 1L, "s", state1.schema,
        (0 until fmt.buckets).toSet)
      assert(rowsOf(all) == rowsOf(state1))
      fmt.drop(spark, root, 1L, "s")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }

    test(s"[$label] carry: dirty-only input serves the full merged state") {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-spillfmt-$label-carry").toString
      fmt.write(spark, root, 1L, "s", "k", state1, carry = None)
      // the churn: key 3 upweighted, key 7 deleted → their buckets dirty
      val dirty = Set(bucketOfKey(3L), bucketOfKey(7L))
      val expected = rowsOf(state1) - ((3L, 1L)) - ((7L, 1L)) + ((3L, 2L))
      val dirtyContent = expected.toSeq.toDF("k", ZSet.W)
        .filter(pmod(hash(col("k")), lit(fmt.buckets)).cast("int")
          .isin(dirty.toSeq: _*))
      val w2 = fmt.write(spark, root, 2L, "s", "k", dirtyContent,
        carry = Some((1L, dirty)))
      assert(rowsOf(w2) == expected,
        "carry write must serve dirty content + carried clean buckets")
      // dirty-read returns exactly the requested buckets' rows
      val dr = rowsOf(fmt.readBuckets(spark, root, 2L, "s", state1.schema, dirty))
      assert(dr == rowsOf(dirtyContent))
      // version-drop survivability: v1 goes, v2 must stay fully readable
      fmt.drop(spark, root, 1L, "s")
      val after = fmt.readBuckets(spark, root, 2L, "s", state1.schema,
        (0 until fmt.buckets).toSet)
      assert(rowsOf(after) == expected,
        "dropping the previous version damaged carried-forward content")
      // and dropping v2 removes its content
      fmt.drop(spark, root, 2L, "s")
      val gone = fmt.readBuckets(spark, root, 2L, "s", state1.schema,
        (0 until fmt.buckets).toSet)
      assert(gone.isEmpty, "dropped version still served rows")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }

    test(s"[$label] fileless read yields an empty frame with the pinned schema") {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-spillfmt-$label-empty").toString
      val e = fmt.readBuckets(spark, root, 9L, "s", state1.schema, Set(0, 1))
      assert(e.schema == state1.schema && e.isEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("[mergelog] carry is metadata-only: fresh data files exist only for dirty buckets") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-spillfmt-mergelog-meta").toString
    MergeLogSpill.write(spark, root, 1L, "s", "k", state1, carry = None)
    val dirty = Set(bucketOfKey(3L))
    val dirtyContent = state1
      .filter(pmod(hash(col("k")), lit(SpillFormat.buckets)).cast("int")
        .isin(dirty.toSeq: _*))
    MergeLogSpill.write(spark, root, 2L, "s", "k", dirtyContent,
      carry = Some((1L, dirty)))
    // v2's pool holds partition dirs ONLY for the dirty buckets — every
    // clean bucket was re-pointed, zero data I/O
    val v2Buckets = Option(new java.io.File(s"$root/pool/s/v2").listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith("__bucket="))
      .map(_.getName.stripPrefix("__bucket=").toInt).toSet
    assert(v2Buckets == dirty,
      s"carry rewrote data for buckets ${v2Buckets -- dirty} it should have re-pointed")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
