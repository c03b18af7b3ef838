package graft.sources

import org.apache.spark.sql.SparkSession

/** Marker-gated local/shared-FS staging for operators that must materialize
  * fixture files before reading them back through a real Spark source
  * (`binaryFile`, partitioned parquet for DPP).
  *
  * Why a marker and not `dir.exists()`: a staging job that fails part-way
  * leaves the directory present, and an existence check would silently
  * reuse the incomplete data on the next run — returning wrong results
  * instead of failing (ADVICE r5). The `_GRAFT_STAGED` marker is written
  * only after the staging body returns, so a partial prior attempt is
  * detected and wiped, then re-staged from scratch.
  *
  * Cluster note: the default root is the driver's `java.io.tmpdir`, which
  * is only reachable by executors in local mode. On a real cluster, set
  * `spark.graft.staging.dir` to a shared filesystem (HDFS/NFS/object-store
  * mount) — the write body runs on executors via `foreachPartition` or
  * `spark.write`, both of which target the same shared path, and the
  * marker (written by the driver after the job completes) provides the
  * atomic visibility cut the `_SUCCESS` convention gives `spark.write`.
  */
object Staging {

  /** Marker file name; binaryFile readers exclude it via `pathGlobFilter`. */
  val Marker = "_GRAFT_STAGED"

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.staging.dir")
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** A session- and input-scoped staging directory path (not yet created). */
  def dirFor(spark: SparkSession, kind: String, inputDir: String): String =
    s"${root(spark)}/graft_${kind}_${spark.sparkContext.applicationId}_" +
      Integer.toHexString(inputDir.hashCode)

  /** Run `write(dir)` at most once per directory: gated on the completion
    * marker, wiping any partial prior attempt first. Synchronized so two
    * concurrent first callers in one JVM cannot interleave stage jobs.
    */
  def ensure(dirPath: String)(write: String => Unit): String = synchronized {
    val dir = new java.io.File(dirPath)
    val marker = new java.io.File(dir, Marker)
    if (!marker.exists()) {
      if (dir.exists()) deleteRecursively(dir)
      dir.mkdirs()
      write(dirPath)
      marker.createNewFile()
    }
    dirPath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
