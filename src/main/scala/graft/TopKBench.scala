package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the custom heap top-k vs the window spelling
  * (which Spark ≥ 3.5 already optimizes with WindowGroupLimit — the
  * comparison is heap vs group-limited-sort, the honest baseline).
  * Synthetic frame: `rows` rows, `groups` groups, k=10, uniform group
  * sizes — the window path's friendliest case (no skew).
  *
  *   sbt "runMain graft.TopKBench [rows] [groups]"
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.range(rows).select(
      (col("id") % groups).as("g"),
      xxhash64(col("id")).as("v"),
      col("id"))

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[topk-bench] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    time("window+WindowGroupLimit") {
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10).count()
    }
    time("heap TopKPerGroup") {
      graft.plans.TopKPerGroup.topKPerGroup(
        df, Seq("g"), Seq(("v", true), ("id", false)), 10).count()
    }
    spark.stop()
  }
}
