package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** MinHash+LSH dedup throughput at a scaled corpus — the dedup-family
  * counterpart of [[StreamBench]]: key-shift `scale` copies of the sf0.1
  * documents into a larger corpus and run the full shingle → signature →
  * band join → exact-verify pipeline.
  *
  * Each copy rewrites every token bijectively (`t → t + "x<i>"`), which
  * preserves every within-copy JACCARD exactly (the honest linear
  * scale-up: 10× docs, ~10× dup pairs) while making cross-copy shingle
  * overlap zero. MinHash RECALL is hash-value-dependent, so per-copy
  * pair counts may legitimately differ from the base corpus's; the run
  * self-checks against the exact-Jaccard truth instead: no emitted pair
  * crosses copies, verified pairs never exceed `scale ×` the exact
  * count, and recall stays ≥ 0.99 of it.
  *
  * NOT copy-shared salt tokens: 35 appended tokens shared by a whole
  * copy put the shared shingles into ~25 % of each doc's MinHash slots,
  * so ~6 % of a copy's docs get a fully salt-determined band value and
  * collapse into one giant bucket — measured 80 docs/s (627 s at 10×)
  * from the O(bucket²) candidate blowup, vs 5,000+ docs/s with the
  * bijective rewrite. The exact verify made the degenerate run CORRECT
  * (same pair set) — only the candidate stage degraded, which is the
  * whole reason the engine separates recall from verification.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DedupBench 10" }}}
  */
object DedupBench {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
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

    val t0 = System.nanoTime()
    val sh = Dedup.shingledDocs(scaled).localCheckpoint()
    val nDocs = sh.count()
    val pairs = Dedup.minhashLshPairs(sh).localCheckpoint()
    val nPairs = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9

    val cross = pairs
      .filter(expr(s"doc_a DIV $off") =!= expr(s"doc_b DIV $off")).count()
    require(cross == 0, s"$cross cross-copy pairs leaked past the salt")
    // Self-check against the EXACT Jaccard pair count, which the bijective
    // token rewrite provably preserves per copy (shingle sets map 1:1, so
    // every pairwise Jaccard is unchanged). MinHash recall is NOT
    // rewrite-invariant — signatures depend on shingle hash values, so a
    // copy can legitimately miss a different (tiny) subset of true pairs;
    // verified output is a subset of truth with per-pair miss probability
    // (1−J²)¹⁶ ≤ 4·10⁻⁴, hence the ≤-bound is strict and the recall floor
    // is far below any plausible healthy value.
    val exactBase = Dedup.exactJaccardPairs(
      Dedup.shingledDocs(base).localCheckpoint(), Dedup.JaccardThreshold).count()
    val expected = scale.toLong * exactBase
    require(nPairs <= expected,
      s"verified pairs $nPairs exceed exact ground truth $expected")
    require(exactBase == 0 || nPairs.toDouble / expected >= 0.99,
      f"LSH recall ${nPairs.toDouble / expected}%.4f below 0.99 " +
        s"($nPairs of $expected exact pairs)")

    println(f"""{"metric":"dedup_docs_per_sec","value":${nDocs / sec}%.0f,"unit":"docs/sec","docs":$nDocs,"pairs":$nPairs,"seconds":$sec%.1f,"scale":$scale}""")

    // Substring-level dedup at the same scale. Unlike MinHash, passage
    // counting is hash-free, so the bijective rewrite invariant is EXACT:
    // windows map 1:1 within a copy and cross-copy windows share no
    // tokens, hence repeated-passage rows must equal scale × base rows —
    // equality, not a recall bound. Both forms run instrumented so the
    // record carries the hash-keyed variant's shuffle-volume delta
    // (VERDICT r4 item 4).
    def measured(body: => Long): (Long, Double, Long) = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(l)
      val t = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t) / 1e9
      Thread.sleep(1000) // listener bus is async: let the final stage land
      spark.sparkContext.removeSparkListener(l)
      (n, sec, acc.get())
    }
    val (nPassages, subSec, exactBytes) =
      measured(Dedup.repeatedPassagesDocs(scaled).count())
    val basePassages = Dedup.repeatedPassagesDocs(base).count()
    require(nPassages == scale.toLong * basePassages,
      s"repeated passages $nPassages != $scale × base $basePassages " +
        "(the bijective rewrite preserves passage counts exactly)")
    println(f"""{"metric":"substring_docs_per_sec","value":${nDocs / subSec}%.0f,"unit":"docs/sec","docs":$nDocs,"passages":$nPassages,"seconds":$subSec%.1f,"shuffle_bytes":$exactBytes,"scale":$scale}""")

    val (nHashed, hashSec, hashedBytes) =
      measured(Dedup.repeatedPassagesHashedDocs(scaled).count())
    require(nHashed == nPassages,
      s"hash-keyed substring dedup rows $nHashed != exact form $nPassages")
    println(f"""{"metric":"substring_hashed_docs_per_sec","value":${nDocs / hashSec}%.0f,"unit":"docs/sec","docs":$nDocs,"passages":$nHashed,"seconds":$hashSec%.1f,"shuffle_bytes":$hashedBytes,"shuffle_ratio_vs_exact":${if (hashedBytes > 0) f"${exactBytes.toDouble / hashedBytes}%.2f" else "null"},"scale":$scale}""")

    // Incremental ingest at the same scale: the whole scaled corpus is
    // the BASE; its LSH index is pinned once (the persisted-index
    // stand-in — building it is the already-amortized cost the
    // incremental path exists to avoid re-paying). The DELTA is a 10%
    // resample of base docs under fresh ids with text UNCHANGED, so
    // every delta doc has an identical (J=1) base source — and identical
    // signatures band together DETERMINISTICALLY, so completeness of the
    // identity pairs is an exact requirement, not a recall bound. Timed:
    // only the per-ingest work (delta shingle/sign/band + index join +
    // candidate-restricted verify).
    val deltaOff = scale.toLong * off
    // the pinned delta frame is the "ingest batch arrives" stand-in: its
    // synthesis (a filter over the regex-rewritten scaled union) is
    // harness cost, not per-ingest operator cost, so it stays untimed
    val delta = scaled.filter(pmod(col("doc_id"), lit(10)) === 3)
      .select((col("doc_id") + deltaOff).as("doc_id"), col("text"))
      .localCheckpoint()
    val baseIndex = Dedup.lshIndex(sh).localCheckpoint()
    baseIndex.count() // materialize the index OUTSIDE the timed window
    val tInc = System.nanoTime()
    val shDelta = Dedup.shingledDocs(delta).localCheckpoint()
    val nDelta = shDelta.count()
    val incPairs = Dedup.incrementalPairs(baseIndex, sh.unionByName(shDelta),
      shDelta).localCheckpoint()
    val nIncPairs = incPairs.count()
    val incSec = (System.nanoTime() - tInc) / 1e9
    // every delta doc must rediscover its identical source, exactly
    val identity = incPairs.filter(col("doc_b") - col("doc_a") === deltaOff &&
      col("jaccard") === 1.0).count()
    // docs whose shingle set is empty (< 3 tokens) can never pair
    val eligible = shDelta.filter(size(col("s")) > 0).count()
    require(identity == eligible,
      s"identity pairs $identity != eligible delta docs $eligible " +
        "(a J=1 pair banding apart would be a broken signature)")
    println(f"""{"metric":"incremental_delta_docs_per_sec","value":${nDelta / incSec}%.0f,"unit":"docs/sec","base_docs":$nDocs,"delta_docs":$nDelta,"pairs":$nIncPairs,"seconds":$incSec%.1f,"full_pipeline_seconds":$sec%.1f,"scale":$scale}""")
    spark.stop()
  }
}
