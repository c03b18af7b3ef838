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

  test("tfidfKeywords: top-3 per doc, deterministic ties, exact local replay") {
    val out = TextOps.tfidfKeywords(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (d, ks0) =>
      val ks = ks0.sortBy(_._2)
      assert(ks.map(_._2).toSeq == (1 to ks.length), s"doc $d ranks contiguous")
      assert(ks.length <= 3)
      // scores non-increasing; equal scores ordered by term
      ks.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 > b._6 || (a._6 == b._6 && a._3 < b._3), s"doc $d order")
        case _ => ()
      }
    }
    // local replay on the collected corpus
    val toks = graft.sources.Tables.table(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").toSeq).toMap
    val tfc = toks.toSeq.flatMap { case (d, w) =>
      w.groupBy(identity).map { case (t, o) => (d, t, o.length.toLong) } }
    val dfv = tfc.groupBy(_._2).view.mapValues(_.length.toLong)
      .filter(_._2 >= 2).toMap
    val want = tfc.filter(t => dfv.contains(t._2))
      .map { case (d, t, tf) =>
        (d, t, tf, dfv(t), math.floor(tf.toDouble / dfv(t) * 1e6 + 0.5) / 1e6) }
      .groupBy(_._1).toSeq.flatMap { case (d, ts) =>
        ts.sortBy(x => (-x._5, x._2)).take(3).zipWithIndex
          .map { case ((_, t, tf, df, sc), i) => (d, i + 1, t, tf, df, sc) } }
      .sortBy(x => (x._1, x._2))
    assert(out.sortBy(x => (x._1, x._2)).toSeq == want, "tfidf local replay")
  }

  test("lmBigramScore: per-doc row, count bounds, and an exact local replay") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val out = TextOps.lmBigramScore(spark, sfDir)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.size == docs.count(), "one score row per document")
    rows.values.foreach { case (nb, nk, frac, adf) =>
      assert(nk >= 0 && nk <= nb, "known occurrences bounded by bigrams")
      assert(frac >= 0.0 && frac <= 1.0)
      assert((nk == 0) == (frac == 0.0) || nb == 0)
      assert(adf == 0.0 || adf >= 2.0, "known bigrams have df >= 2 by definition")
    }
    // exact local replay of the model + scoring on the collected corpus
    val toks = docs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("text").trim.split("\\s+").toSeq).toMap
    val bgs = toks.view.mapValues(w =>
      if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty).toMap
    val df = bgs.toSeq.flatMap { case (d, bs) => bs.distinct.map(_ -> d) }
      .groupBy(_._1).view.mapValues(_.length.toLong).filter(_._2 >= 2).toMap
    bgs.foreach { case (d, bs) =>
      val known = bs.filter(df.contains)
      val (nb, nk, frac, adf) = rows(d)
      assert(nb == bs.length.toLong && nk == known.length.toLong, s"doc $d counts")
      val wantFrac = if (bs.isEmpty) 0.0
        else math.floor(known.length.toDouble / bs.length * 1e6 + 0.5) / 1e6
      val wantAdf = if (known.isEmpty) 0.0
        else math.floor(known.map(df).sum.toDouble / known.length * 1e6 + 0.5) / 1e6
      assert(frac == wantFrac && adf == wantAdf, s"doc $d score replay")
    }
  }

  test("bpe training equals a sequential replay with the same merge semantics") {
    val got = TextOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toList.sortBy(_._1)
    // the incremental loop stops at exhaustion; the NAIVE replay below
    // (full re-count every rank — deliberately the slow textbook form, so
    // it shares no code path with the incremental engine) must match
    // rank-for-rank up to the same stopping point
    assert(got.length <= TextOps.BpeMerges && got.nonEmpty)
    val texts = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val wf = texts.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var reprs: Map[String, Long] = wf.map { case (w, f) =>
      (" " + w.toCharArray.mkString(" ") + " ") -> f
    } // distinct words have distinct reprs, so no key collisions
    val want = scala.collection.mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= TextOps.BpeMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      reprs.foreach { case (repr, f) =>
        val s = repr.trim.split(" ")
        s.lazyZip(s.drop(1)).foreach { (a, b) =>
          counts((a, b)) = counts.getOrElse((a, b), 0L) + f
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        reprs = reprs.groupBy { case (repr, _) =>
          repr.replace(s" $l $r ", s" $l$r ") }.map { case (k, v) => k -> v.values.sum }
        want += ((rank, l, r, l + r, c))
        rank += 1
      }
    }
    assert(got == want.toList, "incremental BPE must match the naive full-recount replay")
  }

  test("bpe encoding equals a per-word local replay of the trained merges") {
    val got = TextOps.bpeEncode(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(got.nonEmpty)
    val merges = TextOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2))).toList
    val rows = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = rows.flatMap { case (src, text) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map(w => (src, w))
    }
    def encodeLen(w: String): Long = {
      var repr = " " + w.toCharArray.mkString(" ") + " "
      merges.foreach { case (l, r) => repr = repr.replace(s" $l $r ", s" $l$r ") }
      repr.trim.split(" ").length.toLong
    }
    val encLen = words.map(_._2).distinct.map(w => w -> encodeLen(w)).toMap
    val want = words.groupBy(_._1).map { case (src, ws) =>
      val wsT = ws.length.toLong
      val bpeT = ws.map(w => encLen(w._2)).sum
      val chars = ws.map(_._2.length.toLong).sum
      (src, wsT, bpeT, chars, bpeT * 1000000L / chars)
    }.toList.sortBy(_._1)
    assert(got == want, "encoded token accounting must bit-match the replay")
    got.foreach { g =>
      assert(g._3 >= g._2, "every word is at least one BPE token")
      assert(g._3 <= g._4, "BPE tokens never exceed characters")
    }
    // merges must actually compress: somewhere BPE beats character count
    assert(got.exists(g => g._3 < g._4))
  }

  test("bpe dictionary floor drops rare words without corrupting survivors") {
    // floor semantics on dictionary admission: floor=F is exactly the
    // floor=1 dictionary restricted to wf >= F (weights untouched)
    // pick the floor from the data: strictly above the rarest word's
    // frequency, so the cut provably drops something at any fixture SF
    val all = TextOps.bpeDictionary(spark, sfDir, floor = 1L)
    val floor = all.map(_._1).min + 1
    val floored = TextOps.bpeDictionary(spark, sfDir, floor)
    assert(floored.toSet == all.filter(_._1 >= floor).toSet,
      "floor must be a pure frequency cut, never a reweighting")
    assert(floored.length < all.length,
      "a floor above the rarest word's frequency must actually drop it")
    // the trained merges over the floored dictionary are exactly what the
    // conf-driven entry point produces
    val want = TextOps.bpeTrainFromDict(spark, floored).collect().map(_.toSeq).toSeq
    spark.conf.set("graft.bpe.minFrequency", floor.toString)
    try {
      val got = TextOps.bpeTrain(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(got == want, "conf floor must wire through to training")
      assert(got.nonEmpty && got.map(_(0)).distinct.size == got.size)
    } finally spark.conf.unset("graft.bpe.minFrequency")
    // default (floor = 1) is the unfloored dictionary — fixture-invariant
    assert(TextOps.bpeMinFrequency(spark) == 1L)
    // malformed floors fail loudly, never silently default
    spark.conf.set("graft.bpe.minFrequency", "0")
    try intercept[Exception](TextOps.bpeMinFrequency(spark))
    finally spark.conf.unset("graft.bpe.minFrequency")
    spark.conf.set("graft.bpe.minFrequency", "many")
    try intercept[Exception](TextOps.bpeMinFrequency(spark))
    finally spark.conf.unset("graft.bpe.minFrequency")
  }
}
