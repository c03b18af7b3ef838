package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the profiling / layout / graph / SCD2 additions; exact
  * value parity is the driver's DuckDB gate.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("scd2: intervals chain, one open version per user, no no-change rows") {
    val rows = Pipelines.scd2Build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, hist0) =>
      val hist = hist0.sortBy(h => (h._3.getTime, h._4.map(_.getTime).getOrElse(Long.MaxValue)))
      // exactly one open (current) version, and it is the last one
      assert(hist.count(_._5) == 1, s"user $u: exactly one is_current")
      assert(hist.last._4.isEmpty && hist.last._5, s"user $u: open interval is last")
      hist.init.foreach(h => assert(h._4.nonEmpty, s"user $u: closed intervals have valid_to"))
      // intervals chain: each valid_to equals the next valid_from
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $u: intervals must chain")
          // the defining SCD2 rule: consecutive versions differ
          assert(a._2 != b._2, s"user $u: no-change rows must be collapsed")
        case _ => ()
      }
    }
  }

  test("profile: one-scan long-format stats agree with direct aggregates") {
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
    val n = li.count()
    val prof = Profiling.profileTable(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(prof.size == 5)
    prof.values.foreach { case (rows, nulls, nd, mn, mx) =>
      assert(rows == n && nulls == 0L && nd > 0 && mn <= mx)
    }
    val ndFlag = li.select(countDistinct(col("l_returnflag"))).head().getLong(0)
    assert(prof("l_returnflag")._3 == ndFlag)
    val qMin = li.agg(min(col("l_quantity"))).head().getDouble(0)
    assert(prof("l_quantity")._4 == BigDecimal(qMin).setScale(2).toString)
  }

  test("morton16: interleave is exact and invertible") {
    // closed-form checks: all-ones in one dimension lands on the odd
    // (resp. even) bit positions only
    val one = spark.range(1).select(
      Layout.morton16(lit(0xFFFFL), lit(0L)).as("a"),
      Layout.morton16(lit(0L), lit(0xFFFFL)).as("b"),
      Layout.morton16(lit(0xFFFFL), lit(0xFFFFL)).as("c")).head()
    assert(one.getLong(0) == 0xAAAAAAAAL)
    assert(one.getLong(1) == 0x55555555L)
    assert(one.getLong(2) == 0xFFFFFFFFL)
    // invertibility over random pairs: decode in Scala, recover inputs
    def deinterleave(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      for (i <- 0 until 16) {
        a |= ((z >> (2 * i + 1)) & 1L) << i
        b |= ((z >> (2 * i)) & 1L) << i
      }
      (a, b)
    }
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val zs = pairs.zipWithIndex.map { case ((a, b), i) =>
      Layout.morton16(lit(a), lit(b)).as(s"z$i")
    }
    val got = spark.range(1).select(zs: _*).head()
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      assert(deinterleave(got.getLong(i)) == ((a, b)), s"pair $i roundtrip")
    }
  }

  test("zorder shards prune a box predicate; orderkey-sorted shards cannot") {
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val shards = 16
    def hitShards(df: org.apache.spark.sql.DataFrame): Long = {
      // per-shard min/max footer, exactly what parquet would persist
      val stats = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      val (pLo, pHi, sLo, sHi) = (1L, 25L, 1L, 3L)
      stats.filter(col("pmin") <= pHi && col("pmax") >= pLo &&
        col("smin") <= sHi && col("smax") >= sLo).count()
    }
    val zHit = hitShards(Layout.zorderShards(li, col("l_partkey"), col("l_suppkey"), shards))
    val linHit = hitShards(li.repartitionByRange(shards, col("l_orderkey")))
    assert(linHit == shards.toLong, "ingest-ordered layout prunes nothing")
    assert(zHit < linHit / 2, s"zorder must prune most shards (hit $zHit of $shards)")
    // Hilbert clustering must prune at least as well as Morton on the same
    // box (its consecutive cells are always adjacent, so shard rectangles
    // are at least as tight)
    val h = Layout.withHilbert(li, col("l_partkey"), col("l_suppkey"), 16, "hv")
      .repartitionByRange(shards, col("hv")).sortWithinPartitions(col("hv"))
    val hHit = hitShards(h)
    assert(hHit <= zHit, s"hilbert (hit $hHit) must not lose to morton (hit $zHit)")
    assert(hHit < shards.toLong / 2, s"hilbert must prune most shards (hit $hHit)")
  }

  test("pagerank: distributed fixed-point ranks equal an exact local replay") {
    val got = Graph.pageRank(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.size == 20)
    // exact local replay with the same integer arithmetic
    val e0 = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(concat(lit("p:"), col("l_partkey")), concat(lit("s:"), col("l_suppkey")))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val sym = e0 ++ e0.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val One = 1000000000000L
    var r = deg.keys.map(_ -> One).toMap
    for (_ <- 1 to 5) {
      val in = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = in.map { case (id, sc) => id -> (One * 3 / 20 + 17 * sc / 20) }
    }
    val want = r.toSeq.sortBy { case (id, rk) => (-rk, id) }.take(20)
    assert(got == want, "distributed ranks must bit-match the local replay")
  }

  test("mixture weights: normalized, and temperature upweights per-token the smaller source") {
    val rows = Pipelines.mixtureWeights(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // weights are a distribution (each term round6'd, so ±n·1e-6 slack)
    val wSum = rows.map(_._4).sum
    assert(math.abs(wSum - 1.0) <= rows.length * 1e-6, s"weights sum to $wSum")
    rows.foreach { case (s, nd, nt, w, ep) =>
      assert(nd > 0 && nt > 0 && w > 0 && ep > 0, s"source $s degenerate")
      // epochs is exactly weight·budget/n_tokens up to the two roundings
      assert(math.abs(ep - w * 1000000.0 / nt) < 2e-3, s"source $s epochs")
    }
    // α=0.5: per-token sampling rate (weight/n_tokens) strictly decreases
    // as the source grows — the whole point of temperature reweighting
    val byTokens = rows.sortBy(_._3)
    byTokens.sliding(2).foreach {
      case Array(a, b) if a._3 < b._3 =>
        assert(a._4 / a._3 > b._4 / b._3,
          s"${a._1} (smaller) must be upweighted per token vs ${b._1}")
      case _ => ()
    }
  }

  test("dataset card: one row per source, counts reconcile, rates bounded") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val rows = Profiling.datasetCard(spark, sfDir).collect()
    assert(rows.length ==
      docs.select(col("source")).distinct().count().toInt)
    val totDocs = rows.map(_.getLong(1)).sum
    assert(totDocs == docs.count(), "per-source docs must cover the corpus")
    rows.foreach { r =>
      val (nDocs, minT, maxT, meanQ, nUniq, dupRate) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7))
      assert(minT >= 1 && minT <= maxT)
      assert(meanQ > 0.0 && meanQ <= 1.0)
      assert(nUniq >= 1 && nUniq <= nDocs)
      assert(dupRate >= 0.0 && dupRate < 1.0)
      assert(math.abs(dupRate - (nDocs - nUniq).toDouble / nDocs) < 2e-6)
    }
  }

  test("profile drift: shares are distributions and abs_diff is their gap") {
    val rows = Profiling.profileDrift(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    assert(math.abs(rows.map(_._4).sum - 1.0) <= rows.length * 1e-6)
    assert(math.abs(rows.map(_._5).sum - 1.0) <= rows.length * 1e-6)
    rows.foreach { case (b, nt, nv, pt, pv, d) =>
      assert(b >= 0 && b <= 10 && nt + nv > 0)
      assert(math.abs(d - math.abs(pt - pv)) <= 3e-6, s"bucket $b abs_diff")
    }
    // slice totals reconcile with the split the buckets were drawn from
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val nTrain = docs.filter(
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000 < 800).count()
    assert(rows.map(_._2).sum == nTrain, "train slice total")
  }

  test("triangle count: degree-oriented join count equals a naive local enumeration") {
    val got = Graph.triangleCount(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got.head
    // naive local replay over the same co-purchase edge set
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq
    val nTri = edges.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b) // a < b < c counts each once
    }.sum
    val nWedges = nodes.map { v => val d = adj(v).size.toLong; d * (d - 1) / 2 }.sum
    assert(r.getLong(0) == nodes.size.toLong, "n_nodes")
    assert(r.getLong(1) == edges.size.toLong, "n_edges")
    assert(r.getLong(2) == nWedges, "n_wedges")
    assert(r.getLong(3) == nTri.toLong, "n_triangles")
    assert(r.getLong(4) == 3L * nTri * 1000000L / nWedges, "global_cc_ppm")
    assert(nTri > 0, "fixture must actually contain triangles")
  }

  test("node similarity: per-edge jaccard equals a naive local replay") {
    val got = Graph.nodeSimilarity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(got.length == 20)
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = edges.toSeq.map { case (a, b) =>
      val cn = (adj(a) & adj(b)).size.toLong
      val un = adj(a).size.toLong + adj(b).size.toLong - cn
      (a, b, cn, un, cn * 1000000L / un)
    }.sortBy { case (a, b, _, _, j) => (-j, a, b) }.take(20)
    assert(got == want, "top-20 edge jaccard must match the local replay")
    assert(got.head._5 > 0, "fixture must have similar pairs")
  }

  test("compaction plan: files partition the corpus at the byte-boundary rule") {
    val got = Layout.compactionPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var cum = 0L
    val assigned = docs.map { case (_, id, n) =>
      val fid = cum / Layout.CompactionTargetBytes; cum += n; (fid, id, n)
    }
    val want = assigned.groupBy(_._1).toList.map { case (fid, g) =>
      (fid, g.length.toLong, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max)
    }.sortBy(_._1)
    assert(got == want, "file assignment must match the sequential replay")
    // every file except possibly the last holds at least the target
    // OR ends exactly at a boundary-straddling doc — weaker sanity: the
    // total reconciles and files are contiguous ids 0..k-1
    assert(got.map(_._1) == got.indices.map(_.toLong).toList)
    assert(got.map(_._3).sum == docs.map(_._3).sum)
  }

  test("hilbert: a true space-filling curve on the full 8-bit grid") {
    // complete proof of curve-ness at 8 bits (the 16-bit query uses the
    // same generator): the map is a BIJECTION onto 0..65535 and every
    // pair of consecutive indices sits in Manhattan-adjacent cells —
    // Morton fails the adjacency property (quadrant jumps), Hilbert may not
    val grid = spark.range(65536L)
      .selectExpr("id % 256 AS x", "id DIV 256 AS y")
    val got = Layout.withHilbert(grid, col("x"), col("y"), 8, "h")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 65536L), "bijection onto 0..2^16-1")
    got.sliding(2).foreach {
      case Array((d1, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"cells at d=$d1,${d1 + 1} must be adjacent: ($x1,$y1) -> ($x2,$y2)")
      case _ => ()
    }
  }

  test("mmr: five distinct picks per query, rank 1 is the pure-relevance argmax") {
    val got = Similarity.annMmr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to Similarity.MmrK), s"query $q ranks")
      assert(g.map(_._3).distinct.length == Similarity.MmrK, s"query $q distinct picks")
      assert(g.forall(_._3 != q), s"query $q must not retrieve itself")
    }
    // rank 1 ignores diversity — it must equal brute-force top-1
    val bf = Similarity.annBruteForce(spark, sfDir).collect()
      .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    byQ.foreach { case (q, g) =>
      assert(g.find(_._2 == 1).get._3 == bf(q), s"query $q rank-1 pick")
    }
  }

  test("kmeans: distributed integer Lloyd's equals an exact local replay") {
    val got = Clustering.kmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.map(_._1) == got.map(_._1).sorted && got.nonEmpty)
    // local replay: same quantization, same argmin tie-break, same
    // truncating integer means, same carry-forward for empty clusters
    val vecs = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Clustering.Scale).cast("long")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq)
      .sortBy(_._1)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    var cents: Seq[(Long, Seq[Long])] =
      vecs.filter(_._1 < Clustering.K).map { case (id, e) => id -> e }
    def assign(e: Seq[Long]) = cents.map { case (cid, ce) => (d2(e, ce), cid) }.min
    for (_ <- 1 to Clustering.Iters) {
      val byC = vecs.map { case (_, e) => (assign(e)._2, e) }.groupBy(_._1)
      cents = cents.map { case (cid, old) =>
        cid -> byC.get(cid).fold(old) { g =>
          val n = g.length
          old.indices.map(i => g.map(_._2(i)).sum / n)
        }
      }
    }
    val want = vecs.map { case (id, e) => val (d, c) = assign(e); (c, id, d) }
      .groupBy(_._1).toSeq.map { case (c, g) =>
        (c, g.length.toLong, g.map(_._3).sum, g.map(_._2).sum, g.map(_._2).min)
      }.sortBy(_._1)
    assert(got == want, "distributed k-means must bit-match the local replay")
    // the 8 clusters partition the corpus
    assert(got.map(_._2).sum == vecs.length.toLong)
  }

  test("product quantization: codes, errors, and ADC top-1 equal an exact local replay") {
    val vecs = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * ProductQuant.Scale).cast("long")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq)
      .sortBy(_._1)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    import ProductQuant.{M, SubDim, Codes, Iters, NumQueries}
    // local replay: per-subspace Lloyd with the shared fixed-point contract
    val cbs = (0 until M).map { m =>
      val sub = vecs.map { case (id, e) => id -> e.slice(m * SubDim, (m + 1) * SubDim) }
      var cents: Seq[(Long, IndexedSeq[Long])] =
        sub.filter(_._1 < Codes).map { case (id, e) => id -> e }
      def assign(e: Seq[Long]) = cents.map { case (cid, ce) => (d2(e, ce), cid) }.min
      for (_ <- 1 to Iters) {
        val byC = sub.map { case (_, e) => (assign(e)._2, e) }.groupBy(_._1)
        cents = cents.map { case (cid, old) =>
          cid -> byC.get(cid).fold(old) { g =>
            val n = g.length
            old.indices.map(i => g.map(_._2(i)).sum / n).toIndexedSeq
          }
        }
      }
      cents.sortBy(_._1)
    }
    def enc(m: Int, e: IndexedSeq[Long]): (Long, Long) = {
      val se = e.slice(m * SubDim, (m + 1) * SubDim)
      cbs(m).map { case (cid, ce) => (d2(se, ce), cid) }.min.swap
    }
    // profile replay
    val wantProfile = (0 until M).flatMap { m =>
      vecs.map { case (id, e) => val (c, d) = enc(m, e); (m, c, id, d) }
        .groupBy(_._2).toSeq.map { case (c, g) =>
          (m, c, g.length.toLong, g.map(_._4).sum, g.map(_._3).sum, g.map(_._3).min)
        }
    }.sortBy(t => (t._1, t._2))
    val gotProfile = ProductQuant.pqProfile(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(gotProfile == wantProfile, "PQ profile must bit-match the local replay")
    // every subspace partitions the corpus
    assert(gotProfile.groupBy(_._1).values.forall(_.map(_._3).sum == vecs.length))
    // ADC replay: query distance tables → M lookups per candidate
    val codes = vecs.map { case (id, e) => id -> (0 until M).map(m => enc(m, e)._1) }.toMap
    val wantAdc = vecs.filter(_._1 < NumQueries).map { case (qid, qe) =>
      val best = vecs.filter(_._1 != qid).map { case (nid, _) =>
        val adc = (0 until M).map { m =>
          val qs = qe.slice(m * SubDim, (m + 1) * SubDim)
          d2(qs, cbs(m)(codes(nid)(m).toInt)._2)
        }.sum
        (adc, nid)
      }.min
      (qid, best._2, best._1)
    }.toSeq
    val gotAdc = ProductQuant.adcTop1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotAdc == wantAdc, "ADC top-1 must bit-match the local replay")
  }

  test("ann_ivf_pq: cell-pruned ADC equals the flat scan; no product join survives") {
    val flat = ProductQuant.adcTop1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val df = ProductQuant.ivfAdcTop1(spark, sfDir)
    val pruned = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pruned == flat,
      "IVF cell pruning must be lossless for ADC top-1 (triangle inequality)")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the flat query×corpus product must be gone — every join equi:\n$plan")
  }

  test("ann_pq_adc: the flat-baseline row fence trips loudly above the cap") {
    // drop the cap below the fixture corpus: the fence must refuse the
    // Q×N scan and point at ann_ivf_pq, never start it
    System.setProperty("graft.pq.flatMaxRows", "10")
    try {
      val ex = intercept[IllegalArgumentException] {
        ProductQuant.adcTop1(spark, sfDir)
      }
      assert(ex.getMessage.contains("ann_ivf_pq") &&
        ex.getMessage.contains("flatMaxRows"),
        s"fence message must route the user to the pruned form: ${ex.getMessage}")
    } finally System.clearProperty("graft.pq.flatMaxRows")
    // with the default cap (1e6) the fixture query stays green
    assert(ProductQuant.adcTop1(spark, sfDir).count() > 0)
  }

  test("collocations: integer lift ranking equals a local replay, support floor holds") {
    val got = graft.functions.TextOps.collocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.length == 20 && got.forall(_._2 >= 5))
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val tok = docs.map(_.trim.split("\\s+").toSeq)
    val uni = tok.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairs = tok.flatMap(w => w.lazyZip(w.drop(1)).map((a, b) => (a, b)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = tok.map(w => math.max(w.length - 1, 0).toLong).sum
    val want = pairs.toSeq.filter(_._2 >= 5).map { case ((a, b), cxy) =>
      (s"$a $b", cxy, uni(a), uni(b), n, n * cxy * 1000000L / (uni(a) * uni(b)))
    }.sortBy { case (bg, _, _, _, _, lift) => (-lift, bg) }.take(20)
    assert(got == want, "top-20 lift ranking must match the local replay")
  }

  test("correlation profile: co-moments reconcile and r is within [-1, 1]") {
    // the internal sums are exact decimal(38,4) since r11; the OUTPUT
    // crosses the boundary as correctly-rounded doubles
    val rows = Profiling.profileCorrelation(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty && rows.length % 3 == 0)
    rows.foreach { case (_, pair, nn, _, _, _, ppm) =>
      assert(nn > 0)
      assert(ppm >= -1000000L && ppm <= 1000000L, s"$pair corr in range")
    }
    // exact local replay: same decimal-exact scaled-integer co-moments,
    // same IEEE closed form (the fixture's columns are near-independent
    // draws — correlations hover around 0 — so only a replay pins values)
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    def corrPpm(n: Long, sx: Double, sy: Double, sxy: Double,
                sxx: Double, syy: Double): Long =
      math.floor((n.toDouble * sxy - sx * sy)
        / (math.sqrt(n.toDouble * sxx - sx * sx)
          * math.sqrt(n.toDouble * syy - sy * sy))
        * 1000000.0).toLong
    li.groupBy(_._1).foreach { case (flag, g) =>
      val n = g.length.toLong
      def e2(f: ((String, BigDecimal, BigDecimal, BigDecimal)) => BigDecimal) =
        (g.map(f).sum * 100).setScale(4)
      def e4(f: ((String, BigDecimal, BigDecimal, BigDecimal)) => BigDecimal) =
        (g.map(f).sum * 10000).setScale(4)
      val (q, p, d) = (e2(_._2), e2(_._3), e2(_._4))
      val qq = e4(t => t._2 * t._2); val pp = e4(t => t._3 * t._3)
      val dd = e4(t => t._4 * t._4); val qp2 = e4(t => t._2 * t._3)
      val qd = e4(t => t._2 * t._4); val pd = e4(t => t._3 * t._4)
      // the closed form casts the exact decimal sums to double — replicate
      // with the identical correctly-rounded conversion
      def cp(sx: BigDecimal, sy: BigDecimal, sxy: BigDecimal,
             sxx: BigDecimal, syy: BigDecimal): Long =
        corrPpm(n, sx.toDouble, sy.toDouble, sxy.toDouble,
          sxx.toDouble, syy.toDouble)
      val want = Map(
        "quantity_x_extendedprice" -> (q.toDouble, p.toDouble, qp2.toDouble,
          cp(q, p, qp2, qq, pp)),
        "quantity_x_discount" -> (q.toDouble, d.toDouble, qd.toDouble,
          cp(q, d, qd, qq, dd)),
        "extendedprice_x_discount" -> (p.toDouble, d.toDouble, pd.toDouble,
          cp(p, d, pd, pp, dd)))
      rows.filter(_._1 == flag).foreach { case (_, pair, nn, sx, sy, sxy, ppm) =>
        val (wx, wy, wxy, wppm) = want(pair)
        assert(nn == n && sx == wx && sy == wy && sxy == wxy && ppm == wppm,
          s"$flag/$pair must bit-match the local replay")
      }
    }
  }

  test("hybrid RRF: ranks dense, scores internally consistent and monotone") {
    val rows = Similarity.searchHybridRrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._2)
      // dense 1..n ranks, scores non-increasing in rank order
      assert(sorted.map(_._2).toSeq == (1 to g.length), s"query $q ranks")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, s"query $q fused scores must be monotone")
      g.foreach { case (_, _, d, rrf, lexR, semR) =>
        assert(d != q, "self-matches excluded")
        // the emitted score IS the integer RRF of the emitted leg ranks
        val want = lexR.map(r => 1000000L / (Similarity.RrfK + r)).getOrElse(0L) +
          semR.map(r => 1000000L / (Similarity.RrfK + r)).getOrElse(0L)
        assert(rrf == want, s"query $q doc $d rrf consistency")
        assert(lexR.isDefined || semR.isDefined, "at least one leg present")
      }
    }
  }

  test("correlation export overflow fails loudly, never NULLs (ADVICE r7 pin)") {
    import spark.implicits._
    // The r11 export is decimal(38,4) (the r10 int64 fence tripped at the
    // two-scale sweep's 10× data, as designed, and the widening it named
    // landed) — the loud-failure pin moves with it: Σ(price²)·10⁴ past
    // ~10³⁴ would NULL under non-ANSI decimal overflow, and the guard
    // must turn that into the named error. price 9.99e15 (max for
    // decimal(18,2)) ⇒ Σp² ≈ 4e32, ·10⁴ ≈ 4e36 ≫ 10³⁴.
    val big = Seq.fill(4)(("A", 1.0, 9.99e15, 0.05)).toDF(
      "l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
    val e = intercept[Exception] {
      Profiling.correlationSums(big).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // two loud paths, both acceptable: under ANSI (Spark 4's default) the
    // decimal multiply itself throws NUMERIC_VALUE_OUT_OF_RANGE before the
    // guard evaluates; under non-ANSI the overflow NULLs and the guard
    // raises the named error. What is PINNED is that neither mode can
    // silently emit NULL sums.
    assert(messages(e).exists(m => m.contains("overflows decimal(38,4)") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
        m.contains("cannot be represented as Decimal(38, 4)")),
      s"must raise a loud overflow error, got: ${messages(e).mkString(" | ")}")
    // and the REAL sf-1 magnitude that used to trip the int64 fence now
    // just works: Σ(price²)·10⁴ ≈ 4e24 sits comfortably inside the export
    val sf1ish = Seq.fill(4)(("A", 1.0, 9.99e9, 0.05)).toDF(
      "l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
    assert(Profiling.correlationSums(sf1ish).collect().length == 1)
  }

  test("winsorize: fences bound the mean, clip counts stay in the 1% tails") {
    val rows = Profiling.profileWinsorize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi, mean) = (r.getAs[Long]("n"), r.getAs[Double]("fence_lo"),
        r.getAs[Double]("fence_hi"), r.getAs[Double]("clipped_mean"))
      assert(lo <= hi && mean >= lo && mean <= hi,
        "clipped mean must sit inside the fences")
      // p01/p99 fences clip at most ~1% + lattice slack per tail
      assert(r.getAs[Long]("n_clipped_lo") <= n / 100 + 1)
      assert(r.getAs[Long]("n_clipped_hi") <= n / 100 + 1)
    }
  }

  test("constraint suite: clean fixture passes; injected defects are counted exactly") {
    import spark.implicits._
    // fixture: six checks, all green, totals = table counts
    val fixture = Profiling.profileConstraints(spark, sfDir).collect()
    assert(fixture.length == 6)
    assert(fixture.forall(_.getAs[Boolean]("passed")),
      "driver fixtures are clean — every check must pass")
    // corrupted frames: every check must fire with the exact count
    val cust = Seq((1L, "alice"), (2L, null.asInstanceOf[String]), (3L, null.asInstanceOf[String]))
      .toDF("c_custkey", "c_name")
    val ord = Seq((10L, 1L, 5.0), (10L, 2L, -1.0), (11L, 99L, 3.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val li = Seq((10L, 0.5, "R"), (10L, 1.5, "R"), (11L, -0.1, "X"))
      .toDF("l_orderkey", "l_discount", "l_returnflag")
    val got = Profiling.constraintReport(cust, ord, li).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got("completeness_c_name") == ((2L, 3L, false)))
    assert(got("uniqueness_o_orderkey") == ((1L, 3L, false)))
    assert(got("non_negative_o_totalprice") == ((1L, 3L, false)))
    assert(got("referential_o_custkey") == ((1L, 3L, false)))
    assert(got("range_l_discount") == ((2L, 3L, false)))
    assert(got("accepted_values_l_returnflag") == ((1L, 3L, false)))
  }

  // shared local co-purchase baskets for the graph-kernel replays below
  private lazy val baskets: Map[Long, Seq[Long]] =
    graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private lazy val copurchaseEdges: Seq[(Long, Long)] =
    baskets.values.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq.distinct

  test("sssp: 6-round Bellman-Ford equals an exact local min-plus replay") {
    val got = Graph.shortestPaths(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got.size <= 20)
    // weighted support-≥2 graph, same integer weight formula
    val sup = baskets.values.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2)
    val wEdges = sup.map { case ((a, b), s) => (a, b, 1000000L / s) }.toSeq
    val sym = wEdges ++ wEdges.map { case (a, b, w) => (b, a, w) }
    assert(sym.nonEmpty, "fixture must yield a support-≥2 graph")
    // max-degree source, ties to the smallest id — as the operator seeds
    val deg = sym.groupBy(_._1).view.mapValues(_.size)
    val src = deg.toSeq.maxBy { case (v, d) => (d, -v) }._1
    var dist = Map(src -> 0L)
    for (_ <- 1 to 6) {
      val relaxed = sym.flatMap { case (u, v, w) => dist.get(u).map(d => (v, d + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val want = dist.toSeq.sortBy { case (v, d) => (d, v) }.take(20)
    assert(got == want, "distributed distances must bit-match the replay")
    assert(got.head == ((src, 0L)), "source must be nearest at cost 0")
  }

  test("kcore: peeling trajectory equals a local replay and shrinks monotonically") {
    val got = Graph.kCore(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got.size == 9, "rounds 0..8")
    // replay on the SAME support-≥3 graph the operator builds
    var e = baskets.values.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= 3).keys.toSeq
    val want = Seq.newBuilder[(Int, Long, Long)]
    def nodes(es: Seq[(Long, Long)]) = (es.map(_._1) ++ es.map(_._2)).distinct
    want += ((0, nodes(e).size.toLong, e.size.toLong))
    for (i <- 1 to 8) {
      val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).view.mapValues(_.size)
      val keep = deg.filter(_._2 >= 3).keySet
      e = e.filter { case (a, b) => keep(a) && keep(b) }
      want += ((i, nodes(e).size.toLong, e.size.toLong))
    }
    assert(got == want.result(), "trajectory must bit-match the replay")
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 <= a._2 && b._3 <= a._3, "peeling only removes")
      case _ => ()
    }
    // every survivor of the final round really has core degree ≥ 3
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).view.mapValues(_.size)
    assert(deg.values.forall(_ >= 3), "3-core invariant on the fixpoint")
    assert(got.head._3 > got.last._3, "fixture must actually peel something")
  }

  test("basket rules: confidence/lift equal an exact integer local replay") {
    val got = Association.basketRules(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.size == 20)
    val n = baskets.size.toLong
    val itemCt = baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val pairCt = baskets.values.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2)
    val rules = pairCt.toSeq.flatMap { case ((a, b), nab) =>
      Seq((a, b, nab), (b, a, nab))
    }.map { case (ante, cons, nab) =>
      (ante, cons, nab,
        nab * 1000000L / itemCt(ante),
        nab * n * 1000000L / (itemCt(ante) * itemCt(cons)))
    }
    val want = rules.sortBy { case (a, c, _, conf, lift) => (-lift, -conf, a, c) }.take(20)
    assert(got == want, "rules must bit-match the replay")
    // lift > 1e6 ppm means genuinely positively-associated pairs exist
    assert(got.head._5 > 1000000L, "top rule must show positive lift")
  }

  test("decayed sum: integer half-life weights equal an exact local replay") {
    val got = Temporal.decayedSum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getString(2), r.getLong(3)))
    val ref = ev.map(_._1).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val agg = ev.iterator
      .map { case (d, u, t, c) =>
        (u, t, c, java.time.temporal.ChronoUnit.DAYS.between(d, ref)) }
      .filter(_._4 < 16)
      .map { case (u, t, c, age) => (u, t, c, 1L << (15 - age)) }
      .toSeq.groupBy(_._1).view.mapValues { rows =>
        (rows.map(r => r._3 * r._4).sum, rows.map(_._4).sum,
          rows.filter(_._2 == "purchase").map(_._4).sum)
      }
    val want = agg.toSeq.map { case (u, (v, e, p)) => (u, v, e, p) }
      .sortBy { case (u, v, _, _) => (-v, u) }
    assert(got == want, "decayed features must bit-match the replay")
    // the horizon filter must actually drop something at fixture scale
    // (events span 30 days, the horizon keeps 16)
    assert(agg.values.map(_._2).sum < ev.size.toLong * 32768L,
      "weights must vary (not all events at age 0)")
  }

  test("dpo pairs: struct-argmax ends equal an exact local replay") {
    val got = Pipelines.dpoPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("lang"), col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("score"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = docs.groupBy(d => (d._1, d._2)).filter(_._2.length >= 2)
      .map { case ((lang, src), ds) =>
        val c = ds.maxBy(d => (d._4, d._3))
        val r = ds.minBy(d => (d._4, d._3))
        (lang, src, ds.length.toLong, c._3, r._3, c._4, r._4, c._4 - r._4)
      }.toSeq.sortBy(t => (t._1, t._2))
    assert(got == want, "pairs must bit-match the replay")
    got.foreach { g =>
      assert(g._4 != g._5, "chosen and rejected must differ")
      assert(g._8 >= 0, "margin is non-negative by construction")
    }
    assert(got.exists(_._8 > 0), "fixture must yield a positive margin somewhere")
  }

  test("search eval: NDCG/recall arithmetic equals a replay over the engine legs") {
    val row = Similarity.searchEvalNdcg(spark, sfDir).collect().head
    val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5))
    // the legs are oracle-gated via search_hybrid_rrf; here we pin that
    // the EVAL arithmetic over those same legs is exact
    val (lexF, semF) = Similarity.hybridLegs(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= Similarity.EvalK)
    val truth = rows(semF).map { case (q, d, r) =>
      (q, d) -> (Similarity.EvalK + 1L - r) }.toMap
    val cand = rows(lexF)
    val w = Similarity.NdcgDiscountPpm
    val perQ = truth.keys.map(_._1).toSeq.distinct.map { q =>
      val mine = cand.filter(_._1 == q)
      val dcg = mine.map { case (_, d, r) =>
        truth.getOrElse((q, d), 0L) * w(r - 1) }.sum
      val hits = mine.count { case (_, d, _) => truth.contains((q, d)) }
      (dcg * 1000000L / Similarity.NdcgIdealDcg,
        hits * 1000000L / Similarity.EvalK)
    }
    val n = perQ.size.toLong
    val want = (n, perQ.map(_._1).sum / n, perQ.map(_._1).min,
      perQ.map(_._1).max, perQ.map(_._2).sum / n,
      perQ.count(_._2 == 0L).toLong)
    assert(got == want, "eval metrics must bit-match the leg replay")
    assert(got._2 >= 0 && got._2 <= 1000000L && got._4 <= 1000000L,
      "NDCG is a normalized ppm")
  }

  test("benford screen equals an exact integer local replay") {
    val got = Profiling.profileBenford(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty && got.map(_._1).forall(d => d >= 1 && d <= 9))
    val cents = graft.sources.Tables.table(spark, sfDir, "orders")
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(_.getLong(0))
    val t = cents.length.toLong
    val want = cents.map(c => c.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case (d, n) =>
        val obs = n * 1000000L / t
        val exp = Profiling.BenfordPpm(d.toInt - 1)
        (d, n, obs, exp, obs - exp)
      }.sortBy(_._1)
    assert(got == want, "digit distribution must bit-match the replay")
    assert(got.map(_._2).sum == t, "digit counts partition the table")
    // TPC-H prices are range-uniform: the gate must actually fire
    assert(got.exists(r => math.abs(r._5) > 50000L),
      "fixture must show a loud Benford violation")
  }

  test("benford screen: non-positive amounts are excluded, not a crash") {
    val s = spark; import s.implicits._
    // a refund, a zero placeholder, and two ordinary rows: without the
    // cents > 0 guard the zero yields digit 0 (element_at throws) and the
    // refund a '-' first character (null digit, oracle divergence)
    val orders = Seq("0.00", "-123.45", "123.45", "987.65")
      .toDF("o_totalprice")
    val out = Profiling.benfordFinish(Profiling.benfordCounts(orders))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (9L, 1L)),
      "only the positive amounts contribute a first digit")
  }

  test("basket rules: lift numerator width guard trips loudly past int64") {
    val s = spark; import s.implicits._
    val ok = Association.rulesFrom(
      Seq((1L, 2L, 2L)).toDF("a", "b", "n_ab"),
      Seq((1L, 4L), (2L, 5L)).toDF("p", "n_i"),
      Seq(10L).toDF("n")).collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 2L, 2L, 500000L, 1000000L), (2L, 1L, 2L, 400000L, 1000000L)),
      "in-range counts produce exact ppm scores")
    // n_ab·n·10⁶ = 3e9·4e9·1e6 ≫ 2⁶³: must raise, never wrap negative
    val ex = intercept[Exception] {
      Association.rulesFrom(
        Seq((1L, 2L, 3000000000L)).toDF("a", "b", "n_ab"),
        Seq((1L, 3000000000L), (2L, 3000000000L)).toDF("p", "n_i"),
        Seq(4000000000L).toDF("n")).collect()
    }
    assert(ex.getMessage.contains("lift numerator"),
      s"expected the width guard, got: ${ex.getMessage}")
    // denominator side: n_a·n_c = 4e9·4e9 ≫ 2⁶³ while the numerator fits
    val ex2 = intercept[Exception] {
      Association.rulesFrom(
        Seq((1L, 2L, 2L)).toDF("a", "b", "n_ab"),
        Seq((1L, 4000000000L), (2L, 4000000000L)).toDF("p", "n_i"),
        Seq(10L).toDF("n")).collect()
    }
    assert(ex2.getMessage.contains("lift denominator"),
      s"expected the denominator guard, got: ${ex2.getMessage}")
  }
}
