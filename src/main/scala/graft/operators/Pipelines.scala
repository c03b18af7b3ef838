package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Composite end-to-end pipelines — the queries a real training-data /
  * product-analytics user runs, each composing the primitive operators
  * (and proving they compose: one Catalyst plan end to end).
  */
object Pipelines {

  /** Corpus curation: quality-filter → exact-dedup (keep lowest doc_id per
    * content hash) → near-dup removal (drop the higher doc_id of every
    * Jaccard≥0.8 pair) → per-source token budget of the surviving corpus.
    * The standard pretraining data-prep funnel as one declarative job.
    */
  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
    val qualified = docs.filter(graft.functions.TextOps.quality >= 0.5)

    // exact dedup: keep the lowest doc_id per content hash
    val keepExact = qualified
      .withColumn("h", md5(col("text")))
      .withColumn("keep", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("keep"))
      .drop("h", "keep")

    // near-dup removal: drop the larger id of every near-dup pair
    val losers = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    val kept = keepExact.join(losers, Seq("doc_id"), "left_anti")

    kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextOps.tokens)).cast("long").as("kept_tokens"))
  }

  /** Deterministic EPOCH SHUFFLE: the reproducible global training order a
    * data loader consumes per epoch. Epoch `e`'s order is
    * `md5("<e>:<doc_id>")` — engine-portable, stable across reruns, and
    * uncorrelated between epochs (each epoch re-keys every doc) — and the
    * global position materializes through [[Ranked.globalRank]]
    * (range-partitioned sort + per-partition offsets), so at 100 TB the
    * shuffle-order sort is fully distributed: no single-partition window,
    * one sorted shard per partition, which is exactly the layout an epoch
    * writer persists. Emitting two epochs' positions per doc is the
    * resume-safe loader-checkpoint shape, and lets the oracle pin
    * inter-epoch decorrelation for free.
    */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents").select("doc_id")
    def pos(e: Int, c: String) = Ranked.globalRank(
      docs.withColumn("k", md5(concat_ws(":", lit(e), col("doc_id")))),
      Seq(col("k")), c).select(col("doc_id"), col(c))
    pos(0, "pos_e0").join(pos(1, "pos_e1"), "doc_id").orderBy("doc_id")
  }

  /** Conversion funnel over the events stream table: per user, did a view
    * lead to a click lead to a purchase (in timestamp order)? Classic
    * product-analytics session ordering via window functions.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
    val perUser = ev.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view", col("ts"))).as("first_view"),
      min(when(col("event_type") === "click", col("ts"))).as("first_click"),
      min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
    perUser.select(
        when(col("first_view").isNull, "no_view")
          .when(col("first_click").isNull || col("first_click") <= col("first_view"), "view_only")
          .when(col("first_purchase").isNull || col("first_purchase") <= col("first_click"), "view_click")
          .otherwise("view_click_purchase").as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention over the events table: users bucketed by first-active
    * day, then distinct active users per (cohort, day-offset) with the
    * cohort's size alongside — the classic retention triangle.
    *
    * Scale design: ONE shuffle keyed by user produces both the cohort day
    * and the user's distinct active-day set from the same hash aggregate
    * (`collect_set` state is calendar-bounded — ≤ days-in-range entries —
    * unlike a general collect), so the events scan runs once and no
    * user-keyed join is needed. Exploding that set and re-aggregating by
    * (cohort, offset) shuffles only (date, date) pairs. Cohort sizes are
    * definitionally the offset-0 diagonal, read back off the tiny
    * aggregated frame (pinned — one computation) via a broadcast self-join
    * rather than a third scan of events.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort_day"), collect_set(col("d")).as("days"))
      .select(col("cohort_day"), explode(col("days")).as("d"))
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .localCheckpoint()
    val sizes = act.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_active").as("cohort_size"))
    act.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"), col("cohort_size"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Content-hash bucket in [0, 1000): the basis for deterministic
    * sampling/splitting. A pure function of the KEY (not of partitioning,
    * row order, or cluster size), so membership is stable across reruns,
    * engines, and scale-ups — the property `df.sample()` (seeded RNG over
    * partition/row position) cannot give, and the one that matters when a
    * 100 TB corpus is re-materialized and the split must not move.
    */
  private[operators] def hashBucket(key: org.apache.spark.sql.Column) =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 1000

  /** Deterministic train/val/test split (80/10/10 of hash space) over
    * documents, by doc_id. Emits per-split doc and whitespace-token counts
    * — what a pretraining run budgets against.
    */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .withColumn("split",
        when(hashBucket(col("doc_id")) < 800, "train")
          .when(hashBucket(col("doc_id")) < 900, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextOps.tokens)).cast("long").as("n_tokens"))

  /** Benchmark decontamination: flag training-corpus docs that share any
    * word 3-gram with a held-out benchmark set (doc_id % 20 == 0 — a
    * deterministic 5% slice standing in for an eval suite), reporting how
    * many distinct benchmark grams each doc leaks. The standard
    * pretraining hygiene step (eval contamination removal) as one
    * declarative plan.
    *
    * Scale design: the benchmark's distinct gram set is small by
    * construction (eval suites are ~10⁴–10⁶ grams) and is broadcast; the
    * corpus side is an exploded inverted index, so detection is one
    * broadcast hash join — never a doc×doc or doc×benchmark pairwise
    * comparison, and the corpus text itself never shuffles.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // materialize the shingles BEFORE exploding (at cluster scale: a
    // persisted gram index). Exploding the raw shingle expression re-runs
    // the whole transform/array_distinct chain per OUTPUT row — measured
    // 22 s vs 0.3 s on the sf0.1 fixture — and the index is read twice
    // (benchmark + corpus branches) anyway.
    val inv = Dedup.shingled(spark, dir).localCheckpoint()
      .select(col("doc_id"), explode(col("s")).as("g"))
    val bench = inv.filter(col("doc_id") % 20 === 0).select("g").distinct()
    inv.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_contaminated_grams"))
      .orderBy("doc_id")
  }

  /** Sequence packing — the LAST step of pretraining data prep: documents
    * are concatenated in a deterministic order (doc_id) and cut into
    * fixed-budget training sequences; each doc is assigned the sequence
    * where it STARTS plus its token offset inside it. One distributed
    * running sum ([[Ranked.runningSum]]: range-partitioned sort + a
    * per-partition-totals pass — never a single-partition global window)
    * and a row-local bin computation, so packing a 100 TB corpus is one
    * sort-shaped shuffle.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val seqLen = 2048L
    val d = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextOps.tokens).cast("long").as("n_tokens"))
    Ranked.runningSum(d, Seq(col("doc_id")), col("n_tokens"), "cum")
      .withColumn("before", col("cum") - col("n_tokens"))
      // integer DIV, not `/` (double division — the exactness trap)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"before DIV $seqLen").as("seq_id"),
        (col("before") % seqLen).as("seq_offset"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified (balancing) sample: every source stratum is
    * hash-downsampled toward HALF the smallest stratum's size — the
    * mixture rebalancing step of a pretraining data recipe (half, so the
    * rule visibly samples even when all strata are equal). Per-stratum
    * rate is `(500·n_min) DIV n_s` of hash space (integer arithmetic end
    * to end).
    * Returns the sampled MEMBERSHIP (doc_id, source) so the gate checks
    * row-exact reproducibility, not just counts. The per-source rate table
    * is tiny → broadcast; the big table is filtered by a pure row-local
    * predicate, so the only wide work is the rate aggregation itself.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    // n_min as a scalar agg cross-joined back (1 row, broadcast) — not an
    // empty-frame window, which plans as a single-partition WindowExec;
    // the two references to `counts` share one physical aggregation via
    // exchange reuse, so documents is still scanned once.
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_s")).as("n_min"))))
      // integer DIV: Column `/` is double division (exactness trap)
      .withColumn("thr", expr("(500 * n_min) DIV n_s"))
      .select(col("source"), col("thr"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(hashBucket(col("doc_id")) < col("thr"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Contrastive negative sampling — for each anchor doc, k=4
    * deterministic negatives at ids `(anchor + j·173) mod N` (173 is
    * coprime to any fixture N, so the probe sequence cycles the whole id
    * space), keeping only cross-source pairs (an in-source "negative" is
    * a false negative for contrastive training — the standard hygiene
    * filter). Candidate generation is a row-local explode of pure id
    * arithmetic — NO shuffle until the two ids-only hash joins that
    * attach the sources; payload text never moves. Deterministic ⇒ the
    * pair set is reproducible across epochs, machines, and cluster
    * topologies, and a DuckDB oracle replays it verbatim.
    */
  def negativePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val cand = docs
      .select(col("doc_id").as("anchor_id"), col("source").as("anchor_source"),
        explode(sequence(lit(1), lit(4))).as("j"))
      .crossJoin(broadcast(n))
      .withColumn("neg_id", (col("anchor_id") + col("j") * 173) % col("n_docs"))
    cand.join(docs.select(col("doc_id").as("neg_id"),
        col("source").as("neg_source")), Seq("neg_id"))
      .filter(col("neg_source") =!= col("anchor_source"))
      .select(col("anchor_id"), col("j"), col("neg_id"),
        col("anchor_source"), col("neg_source"))
      .orderBy(col("anchor_id"), col("j"))
  }

  val negativePairsOracleSql: String =
    """WITH n AS (SELECT count(*) AS n_docs FROM documents),
      |c AS (SELECT d.doc_id AS anchor_id, d.source AS anchor_source, j.j,
      |             (d.doc_id + j.j * 173) % n.n_docs AS neg_id
      |      FROM documents d, (SELECT UNNEST([1, 2, 3, 4]) AS j) j, n)
      |SELECT c.anchor_id, c.j, c.neg_id, c.anchor_source,
      |       d2.source AS neg_source
      |FROM c JOIN documents d2 ON d2.doc_id = c.neg_id
      |WHERE d2.source <> c.anchor_source
      |ORDER BY anchor_id, j""".stripMargin

  /** Deterministic per-stratum reservoir sample — EXACTLY k docs per
    * source, chosen as the k smallest md5 ranks (min-k hashing: a uniform
    * k-sample that is rerun-stable, scale-stable, and identical on any
    * cluster topology, unlike an RNG reservoir). The rate-based
    * [[stratifiedSample]] gives binomial-sized strata; training-data
    * loaders that need exact quota per source use this form.
    *
    * Routed through the custom [[graft.plans.TopKPerGroup]] physical
    * operator: partial bounded heaps per partition (k·|sources| state),
    * one shuffle of k-per-group-per-partition survivors, final heaps —
    * O(n log k) sort-free where the window spelling sorts each partition.
    */
  def reservoirSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val ranked = Tables.table(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        md5(concat(lit("reservoir:"), col("doc_id").cast("string"))).as("rk"))
    graft.plans.TopKPerGroup.topKPerGroup(ranked,
        Seq("source"), Seq(("rk", false), ("doc_id", false)), k)
      .orderBy("source", "doc_id")
  }

  val reservoirOracleSql: String =
    """SELECT source, doc_id, rk FROM (
      |  SELECT source, doc_id,
      |         md5('reservoir:' || CAST(doc_id AS VARCHAR)) AS rk,
      |         row_number() OVER (
      |           PARTITION BY source
      |           ORDER BY md5('reservoir:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 5
      |ORDER BY source, doc_id""".stripMargin

  /** Document chunking — fixed token-window chunks with overlap (window 32,
    * stride 24), the context-window prep step of every RAG / pretraining
    * ingestion flow. Entirely row-local: tokenize once per doc, posexplode
    * the (cheap, int-only) chunk-start sequence, then slice the retained
    * token array per chunk — no shuffle anywhere, so chunking a 100 TB
    * corpus is a pure map over the scan. (The exploded expression is the
    * integer start sequence, NOT the token array or chunk text — the
    * expensive per-chunk work happens once per OUTPUT row by necessity,
    * and the tokenization once per INPUT row; the explode-re-evaluation
    * trap only bites when the expensive expression is under the explode.)
    */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame = {
    val window = 32
    val stride = 24
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        array_join(slice(col("tk"), col("col") + 1, lit(window)), " ").as("chunk_text"),
        least(lit(window), size(col("tk")) - col("col")).cast("long").as("n_tokens"))
  }

  /** Deterministic weighted corpus interleave — the training-mixture
    * SCHEDULE: each source stratum is shuffled by a content hash (not an
    * RNG — same reproducibility argument as [[hashBucket]]) and the strata
    * are merged stride-scheduling style, so a weight-3 source appears 3×
    * as often as a weight-1 source at every prefix of the schedule, not
    * just in aggregate. Integer arithmetic end to end (emission key =
    * (rank−1)·(LCM/weight)), so the order is engine-reproducible.
    *
    * Scale shape: the schedule is computed over (source, doc_id) ONLY —
    * document payloads never shuffle; training readers join them back by
    * id. NO per-stratum window anywhere: the per-source rank comes from
    * [[Ranked.stratifiedRank]] (range-partitioned sort + per-stratum
    * partition offsets), so a one-source-dominates mixture spans many
    * partitions instead of serializing into a single partition's sort;
    * the final global position comes from [[Ranked.globalRank]].
    */
  def interleaveSources(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("source"), col("doc_id"))
    // weights {1,2,3} derived from the source name: a stand-in for the
    // mixture recipe's per-source sampling weights. Digitless names fall
    // back to weight 1 (coalesce) — matching the oracle's TRY_CAST — so
    // engine and oracle can't diverge on an unanticipated source name.
    val w = lit(1L) +
      (coalesce(regexp_extract(col("source"), "(\\d+)", 1).cast("long"), lit(0L)) % 3L)
    val hashed = docs
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))))
    val ranked = Ranked.stratifiedRank(hashed,
        Seq(col("source")), Seq(col("h"), col("doc_id")), "rnk")
      // LCM(1,2,3)=6: weight w emits every 6/w positions — exact longs
      .withColumn("ikey", (col("rnk") - 1L) *
        when(w === 1L, 6L).when(w === 2L, 3L).otherwise(lit(2L)))
      .select(col("ikey"), col("source"), col("rnk"), col("doc_id"))
    Ranked.globalRank(ranked, Seq(col("ikey"), col("source"), col("rnk")), "pos")
      .select(col("pos"), col("source"), col("doc_id"))
  }

  /** CDC upsert compaction — latest-version-per-key, the operation every
    * dataset-versioning/lakehouse flow runs (MERGE's read side). The
    * change set is derived deterministically from the base table (every
    * 10th order re-priced), and compaction is expressed as
    * `changes ∪ (base ⟕anti changes)` — the scale-right MERGE shape: one
    * hash (anti-)join on the key, no wide aggregation of full rows, no
    * window sort. No broadcast hint on the change set: when deltas are
    * broadcast-size (the common case) AQE picks the broadcast anti-join
    * and the base side never shuffles; when a backfill-scale delta
    * arrives, the planner falls back to a shuffled join instead of
    * OOMing on a forced broadcast.
    */
  def cdcUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), lit(0L).as("version"))
    val changes = Tables.table(spark, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"), lit(1L).as("version"))
    val kept = base.join(changes.select(col("o_orderkey").as("ck")),
      col("o_orderkey") === col("ck"), "left_anti")
    changes.unionByName(kept)
  }

  /** SCD Type-2 dimension build from a CDC event log — the other half of
    * the lakehouse MERGE story ([[cdcUpsert]] keeps only the latest
    * version; SCD2 keeps the full history as validity intervals). Each
    * user's events are a change stream of their `event_type` state:
    * consecutive duplicates are collapsed (a no-change record opens no new
    * version — the defining SCD2 rule), then every retained change gets
    * `[valid_from, valid_to)` from its own and the next change's
    * timestamp, with the open interval flagged `is_current`.
    *
    * Scale shape: both passes are windows PARTITIONED BY the dimension key
    * (`user_id`) — millions of keys at corpus scale, each holding one
    * entity's short history, so the sort is hash-distributed with no
    * single hot partition (unlike a global or low-cardinality-partition
    * window). One shuffle total: both windows share the same
    * (partition, ordering) spec, so Catalyst plans one Exchange + one
    * Sort and runs the lag-filter and lead in the same WindowExec stage.
    * Ties inside a key are broken by `event_id` (the CDC log's sequence
    * number), so the history is deterministic under equal timestamps.
    */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Temperature-based mixture reweighting — the sampling-weight
    * computation every multi-source pretraining run performs (the
    * `p_s ∝ n_s^α` rule, α = 0.5 here: upweight small high-value sources
    * relative to their token share without letting any source dominate).
    * Emits, per source: its token count, its normalized sampling weight,
    * and the number of EPOCHS of that source a fixed token budget implies
    * (weight·budget / n_tokens — the over-sampling factor the loader must
    * support; > 1 means the source repeats).
    *
    * Determinism: each source's raw weight √n_tokens is snapped to a
    * scaled long (`floor(√n·10⁶ + 0.5)`) BEFORE the normalizing sum, so
    * the total is an integer sum — associative and engine-exact — rather
    * than a float sum whose value depends on addend order. `sqrt` itself
    * is IEEE-correctly-rounded in both engines; everything after the snap
    * is integer or single-division arithmetic mirrored in the oracle.
    *
    * Scale shape: one scan → per-source hash aggregate (map-side
    * combined; the group count is the source count, tiny by definition),
    * then a broadcast of the one-row total. Token counting rides the same
    * scan. Nothing here grows with corpus size except the single pass.
    */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val budget = 1000000L // token budget the epochs column is quoted against
    val per = Tables.table(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextOps.tokens)).cast("long").as("n_tokens"))
      .withColumn("w_scaled",
        floor(sqrt(col("n_tokens").cast("double")) * 1000000.0 + 0.5).cast("long"))
    val tot = per.agg(sum(col("w_scaled")).as("w_tot"))
    import graft.functions.TextOps.round6
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round6(col("w_scaled").cast("double") / col("w_tot").cast("double"))
          .as("weight"),
        round6(col("w_scaled").cast("double") / col("w_tot").cast("double")
          * lit(budget.toDouble) / col("n_tokens").cast("double")).as("epochs"))
      .orderBy(col("source"))
  }

  /** DATASET SNAPSHOT DIFF — "what changed between corpus version v1 and
    * v2", the audit every training-data release cuts (and the input to
    * incremental recomputation: only `added`/`changed` docs re-enter the
    * dedup/quality pipeline). v1 is derived deterministically from the
    * fixture (docs with `doc_id % 10 != 0`, text suffixed where
    * `doc_id % 7 == 0` — a closed form the oracle replays), v2 is the
    * documents table itself; the diff never compares text directly:
    * each side reduces to `(doc_id, md5)` at the scan, a full outer join
    * on the KEY classifies added / removed / changed / unchanged, and
    * only ids+hashes shuffle — at 100 TB the payload never moves, which
    * is what makes release auditing affordable.
    */
  def datasetDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
    val v1 = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("k1"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [v1]")))
          .otherwise(col("text"))).as("h1"))
    val v2 = docs.select(col("doc_id").as("k2"), md5(col("text")).as("h2"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .select(coalesce(col("k1"), col("k2")).as("doc_id"),
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("status"))
  }

  /** PREFERENCE-PAIR CONSTRUCTION (DPO/RLHF shape) — for every
    * (lang, source) prompt-group, pair the highest-scoring document
    * (chosen) with the lowest (rejected) and report the margin. Score is
    * the whitespace token count (the engine-portable spelling TextOps
    * pins); ties break by doc_id. The argmax is ONE hash aggregate:
    * `max(struct)` would be the obvious spelling but struct buffers are
    * not hash-aggregable (Spark plans them as SortAggregate — a full
    * per-partition sort of the corpus), so (score, id) is bit-PACKED
    * into a single bigint `score·2³³ + id`, which max/min order
    * lexicographically as long as both halves respect their width. The
    * widths are GUARDED loudly, not assumed: score < 2³⁰ (a >1 B-token
    * document is not a document) and doc_id < 2³³ raise_error with the
    * offending value — the ADVICE-r7 overflow discipline. Groups need
    * ≥ 2 docs ((score,id) uniqueness then guarantees chosen ≠ rejected).
    *
    * Scale shape: one scan, one map-side-combined HASH aggregate keyed
    * by the group; output is groups-sized. The production variant swaps
    * the score column for a reward-model output and the group key for a
    * prompt hash — the plan is identical.
    */
  def dpoPairs(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .select(col("lang"), col("source"),
        expr("""CASE WHEN doc_id >= 0 AND doc_id < 8589934592
                THEN doc_id ELSE raise_error(CONCAT(
                  'dpoPairs: doc_id outside [0, 2^33): ', doc_id)) END""")
          .as("id"),
        expr("""CASE WHEN size(split(trim(text), '\\s+')) < 1073741824
                THEN CAST(size(split(trim(text), '\\s+')) AS BIGINT)
                ELSE raise_error('dpoPairs: token count exceeds 2^30') END""")
          .as("score"))
      .select(col("lang"), col("source"),
        (col("score") * lit(8589934592L) + col("id")).as("packed"))
    scored.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("packed")).as("c"), min(col("packed")).as("r"))
      .filter(col("n_docs") >= 2)
      .select(col("lang"), col("source"), col("n_docs"),
        // integer DIV/%, never Column `/` (IEEE doubles lose exactness
        // above 2^53 — the ADVICE-r7 prefix-cut lesson)
        (col("c") % 8589934592L).as("chosen_id"),
        (col("r") % 8589934592L).as("rejected_id"),
        expr("c DIV 8589934592").as("chosen_score"),
        expr("r DIV 8589934592").as("rejected_score"),
        expr("c DIV 8589934592 - r DIV 8589934592").as("margin"))
      .orderBy(col("lang"), col("source"))
  }

  /** DuckDB oracle for [[dpoPairs]]: the same bit-packed argmax/argmin
    * (identical `score·2³³ + id` arithmetic, `//` integer unpack).
    */
  val dpoPairsOracleSql: String =
    """WITH scored AS (SELECT lang, source,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |    * 8589934592 + doc_id AS packed
      |  FROM documents)
      |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |  max(packed) % 8589934592 AS chosen_id,
      |  min(packed) % 8589934592 AS rejected_id,
      |  max(packed) // 8589934592 AS chosen_score,
      |  min(packed) // 8589934592 AS rejected_score,
      |  max(packed) // 8589934592 - min(packed) // 8589934592 AS margin
      |FROM scored GROUP BY lang, source HAVING count(*) >= 2
      |ORDER BY lang, source""".stripMargin
}
