package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Durable snapshots of the incremental-Q3 state.
  *
  * Structured Streaming's own checkpoint only persists SOURCE offsets for
  * a `foreachBatch` query — the z-set states live on the driver as cached
  * DataFrames and would not survive a restart. Snapshotting them as
  * parquet (exact types: decimal revenue, dates, weights) makes the IVM
  * restartable: resume = load + keep folding. At cluster scale this is
  * the same pattern with a transactional table format in place of
  * overwrite-parquet; the z-set algebra on top is unchanged.
  *
  * The reference has no recovery story at all (SURVEY §2.8: no
  * checkpointing configured, heap-only state) — this is the upgrade
  * Spark's ecosystem makes cheap.
  */
object Snapshots {

  private val baseParts = Seq("c", "o", "l", "co")

  /** Persist every state z-set (base states + one dir per aggregate
    * grain), the grain key lists, the compaction counter, and the spill
    * version history — without the history a resumed spilled fold would
    * restart pruning from scratch and leak every pre-snapshot spill
    * version forever (the at-most-two-on-disk invariant). The dirty-bucket
    * bookkeeping ([[IncrementalQ3.SpillMeta]]) is deliberately NOT
    * persisted: a resumed fold's first compaction falls back to a full
    * rewrite (correct, just not incremental once), then tracking resumes.
    */
  def save(st: IncrementalQ3.State, dir: String): Unit = {
    val parts = baseParts ++ st.aggsRaw.indices.map(IncrementalQ3.aggName)
    parts.zip(st.all).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name")
    }
    Files.write(Paths.get(s"$dir/grains"),
      st.aggsRaw.map(_._1.mkString(",")).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$dir/dirty"),
      st.dirty.toString.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$dir/spill_history"),
      st.spillHistory.mkString(",").getBytes(StandardCharsets.UTF_8))
  }

  /** Load a snapshot; the returned state folds on via [[IncrementalQ3.step]].
    *
    * Each state is eagerly localCheckpoint'd on load: the non-compacting
    * upkeep path in [[IncrementalQ3.step]] keeps the loaded frames in its
    * union lineage indefinitely, and without severing it here a later
    * [[saveBatch]] prune (or an overwriting [[save]]) would delete the very
    * parquet files the live state still scans.
    */
  def load(spark: SparkSession, dir: String): IncrementalQ3.State = {
    // grain list: from the grains file; pre-r11 snapshots had a single
    // implicit Q3 grain stored under "agg"
    val grainsFile = Paths.get(s"$dir/grains")
    val (grains, aggDirs) =
      if (Files.exists(grainsFile)) {
        val gs = new String(Files.readAllBytes(grainsFile), StandardCharsets.UTF_8)
          .split("\n").toIndexedSeq.map(_.trim).filter(_.nonEmpty)
          .map(_.split(",").toIndexedSeq.map(_.trim))
        (gs, gs.indices.map(IncrementalQ3.aggName))
      } else
        (IndexedSeq(IncrementalQ3.DefaultAggKeys.toIndexedSeq), IndexedSeq("agg"))
    def part(name: String) =
      spark.read.parquet(s"$dir/$name").localCheckpoint()
    val Seq(c, o, l, co) = baseParts.map(part)
    // spill_history may be absent in pre-spill snapshots — default Nil
    val histFile = Paths.get(s"$dir/spill_history")
    val history =
      if (!Files.exists(histFile)) Nil
      else new String(Files.readAllBytes(histFile), StandardCharsets.UTF_8)
        .split(",").toList.flatMap(_.trim.toLongOption)
    IncrementalQ3.State(c, o, l, co,
      aggsRaw = grains.zip(aggDirs).map { case (keys, d) => (keys: Seq[String]) -> part(d) }.toVector,
      dirty = new String(Files.readAllBytes(Paths.get(s"$dir/dirty")),
        StandardCharsets.UTF_8).trim.toInt,
      spillHistory = history)
  }

  // --- per-batch snapshots for the continuous query (auto-resume) ------
  //
  // Layout: $dir/b<batchId>/{c,o,l,co,agg*,grains,dirty} plus a LATEST
  // pointer file holding the last fully-written batch id. The pointer is
  // flipped by ATOMIC_MOVE only AFTER the snapshot directory is complete,
  // so a crash mid-save leaves LATEST at the previous consistent snapshot.
  // Snapshots older than LATEST are pruned after the flip — at any moment
  // at most two live on disk (the one being written + the last good one).

  /** Persist the post-batch state and advance the LATEST pointer. */
  def saveBatch(st: IncrementalQ3.State, dir: String, batchId: Long): Unit = {
    save(st, s"$dir/b$batchId")
    val tmp = Paths.get(s"$dir/.LATEST.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(s"$dir/LATEST"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // prune superseded snapshots (anything but b<batchId>)
    val ds = Files.list(Paths.get(dir))
    try {
      ds.filter(p => p.getFileName.toString.startsWith("b") &&
          p.getFileName.toString != s"b$batchId")
        .forEach { p =>
          val fs = Files.walk(p)
          try fs.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.delete(f))
          finally fs.close()
        }
    } finally ds.close()
  }

  /** Latest consistent per-batch snapshot, if one exists:
    * `(state, lastAppliedBatchId)`.
    */
  def loadLatest(spark: SparkSession, dir: String): Option[(IncrementalQ3.State, Long)] = {
    val latest = Paths.get(s"$dir/LATEST")
    if (!Files.exists(latest)) None
    else {
      val id = new String(Files.readAllBytes(latest),
        StandardCharsets.UTF_8).trim.toLong
      Some((load(spark, s"$dir/b$id"), id))
    }
  }
}
