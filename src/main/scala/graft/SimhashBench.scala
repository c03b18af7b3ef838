package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** The SimHash chunk-regime switch, MEASURED at its boundary (r11 verdict
  * item 7): scale the sf0.1 documents past 100K docs so
  * [[Dedup.simhashChunks]] narrows from the wide 16-chunk band (radius 15,
  * within-bucket quadratic) to the 8-chunk regime (radius 7, 256
  * buckets/chunk), then run the full signature → band join → hamming
  * prefilter → exact-verify pipeline and score it against exact-Jaccard
  * ground truth.
  *
  * Ground truth is closed-form under the bijective per-copy token rewrite
  * (see [[DedupBench]]): every within-copy Jaccard is preserved, so the
  * true J ≥ 0.9 pair set of the scaled corpus is exactly `scale ×` the
  * base corpus's. PRECISION is exact by construction (candidates are
  * exact-verified, cross-copy pairs share zero shingles); RECALL is the
  * measurement — the narrowed radius guarantees only hamming ≤ 7, while
  * SimHash signatures are hash-valued, so the run ALSO reports the
  * hamming histogram of the true pairs (how much of the truth sits past
  * the guaranteed radius) and the recall split at the boundary: everything
  * within radius must be found (the pigeonhole guarantee, asserted), and
  * whatever sits past it is the documented price of the narrowed regime —
  * the any-radius exact path at scale is MinHash+LSH.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SimhashBench 21" }}}
  */
object SimhashBench {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(21)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val off = 1000000000L
    val base = Tables.table(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val scaled = (0 until scale).map { i =>
      base.select((col("doc_id") + lit(i * off)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text"))
    }.reduce(_ unionByName _)

    val sh = Dedup.shingledDocs(scaled).localCheckpoint()
    val nDocs = sh.count()
    val nChunks = Dedup.simhashChunks(nDocs)
    require(nDocs > 100000L && nChunks == 8,
      s"regime switch unexercised: $nDocs docs derived $nChunks chunks — " +
        "scale the corpus past 100K so the narrowed band engages")

    val t0 = System.nanoTime()
    val found = Dedup.simhashPairsDocs(sh).localCheckpoint()
    val nFound = found.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // exact ground truth: scale × base exact pairs, mapped per copy
    val baseSh = Dedup.shingledDocs(base).localCheckpoint()
    val basePairs = Dedup.exactJaccardPairs(baseSh, Dedup.SimhashJaccardThreshold)
      .select("doc_a", "doc_b").localCheckpoint()
    val truth = (0 until scale).map { i =>
      basePairs.select((col("doc_a") + lit(i * off)).as("doc_a"),
        (col("doc_b") + lit(i * off)).as("doc_b"))
    }.reduce(_ unionByName _).localCheckpoint()
    val nTruth = truth.count()

    val cross = found
      .filter(expr(s"doc_a DIV $off") =!= expr(s"doc_b DIV $off")).count()
    require(cross == 0, s"$cross cross-copy pairs leaked past the rewrite")
    val spurious = found.select("doc_a", "doc_b")
      .join(truth, Seq("doc_a", "doc_b"), "left_anti").count()
    require(spurious == 0,
      s"$spurious emitted pairs are not in the exact truth — verification broke")

    // hamming histogram of the TRUE pairs on the scaled signatures: how
    // much of the truth sits past the narrowed radius (nChunks − 1)
    val sig = Dedup.simhashSignatures(sh).localCheckpoint()
    val withH = truth
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .select(expr("bit_count(siga ^ sigb)").as("h"))
      .localCheckpoint()
    val hist = withH.groupBy("h").agg(count(lit(1)).as("n")).orderBy("h")
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val radius = nChunks - 1
    val inRadius = hist.collect { case (h, n) if h <= radius => n }.sum
    // the pigeonhole GUARANTEE: every true pair within the radius is found
    val foundTrue = found.select("doc_a", "doc_b")
      .join(truth, Seq("doc_a", "doc_b")).count()
    require(foundTrue >= inRadius,
      s"found $foundTrue true pairs but $inRadius sit within radius $radius " +
        "— the pigeonhole guarantee was violated")
    val recall = if (nTruth == 0) 1.0 else foundTrue.toDouble / nTruth
    val histStr = hist.map { case (h, n) => s""""$h":$n""" }.mkString("{", ",", "}")
    println(f"""{"metric":"simhash_docs_per_sec","value":${nDocs / sec}%.0f,"unit":"docs/sec","docs":$nDocs,"chunks":$nChunks,"radius":$radius,"found":$nFound,"true_pairs":$nTruth,"true_in_radius":$inRadius,"recall":$recall%.4f,"seconds":$sec%.1f,"hamming_hist":$histStr,"scale":$scale}""")
    spark.stop()
  }
}
