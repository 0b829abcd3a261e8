package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Specs for the corpus-versioning / training-order / tokenizer-training
  * operators (d31, t23, t24) — each checked against an exact driver-side
  * reference, the [[GraphSpec]] discipline.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ─── d31 snapshot diff ───────────────────────────────────────────────

  test("d31 classifies every doc_id by the derivation rules exactly") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"src${i % 4}", s"text of document $i"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.snapshotDiffOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[String]("status"))).toMap
    val want = (0L until 300L).flatMap { i =>
      val inOld = i % 7 != 0
      val inNew = i % 5 != 1
      val changed = i % 11 == 3
      val status =
        if (!inOld && !inNew) None
        else if (!inOld) Some("added")
        else if (!inNew) Some("removed")
        else if (changed) Some("changed") else Some("unchanged")
      status.map(s => i -> ((s"src${i % 4}", s)))
    }.toMap
    assert(got == want)
    // every class is actually exercised by the derivation
    val byStatus = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    Seq("added", "removed", "changed", "unchanged")
      .foreach(s => assert(byStatus.getOrElse(s, 0) > 0, s"no $s rows"))
  }

  test("d31 revision suffix changes the fingerprint, identity text does not") {
    import spark.implicits._
    // doc 3 (in both, %11==3) must read changed; doc 2 unchanged
    val docs = Seq((2L, "s", "same"), (3L, "s", "same"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.snapshotDiffOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(2L -> "unchanged", 3L -> "changed"))
  }

  // ─── t23 deterministic shuffle-shard ─────────────────────────────────

  test("t23 shards are the data-derived count, positions contiguous per shard") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val n = docs.count()
    val wantShards = math.max(16L, (n + 199L) / 200L)
    val rows = TextAnalysis.shuffleShardOf(docs).collect()
    assert(rows.length.toLong == n)
    assert(rows.map(_.getAs[Long]("doc_id")).toSet ==
      docs.collect().map(_.getAs[Long]("doc_id")).toSet)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.keys.foreach(s => assert(s >= 0 && s < wantShards))
    // positions within a shard are exactly 1..|shard|
    byShard.foreach { case (s, rs) =>
      val pos = rs.map(_.getAs[Long]("pos")).sorted
      assert(pos.toSeq == (1L to rs.length.toLong), s"shard $s positions")
    }
  }

  test("t23 order is deterministic and invariant to input partitioning") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val a = TextAnalysis.shuffleShardOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .sortBy(_._1)
    val b = TextAnalysis.shuffleShardOf(docs.repartition(17)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  // ─── t24 BPE merge training ──────────────────────────────────────────

  /** Driver-side reference: the identical word census, pair count,
    * count-DESC-lexical top-1, and TWO-PASS java replace per round —
    * String.replace scans exactly like Spark's and DuckDB's `replace`,
    * so this is the operator's merge rule verbatim.
    */
  private def referenceBpe(texts: Seq[String]): Seq[(Long, String, String, Long)] = {
    val words = texts.flatMap(t => "\\S+".r.findAllIn(t.toLowerCase).toSeq)
    val wc = words.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    var seqs: Map[String, String] =
      wc.keys.map(w => w -> w.map(ch => s" $ch").mkString("", "", " ")).toMap
    val out = scala.collection.mutable.Buffer[(Long, String, String, Long)]()
    var k = 1L
    var done = false
    while (k <= 6 && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, s) <- seqs) {
        val toks = s.trim.split(" ")
        for (i <- 0 until toks.length - 1)
          pairs((toks(i), toks(i + 1))) =
            pairs.getOrElse((toks(i), toks(i + 1)), 0L) + wc(w)
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), pc) = pairs.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((k, l, r, pc))
        val (pat, rep) = (s" $l $r ", s" $l$r ")
        seqs = seqs.map { case (w, s) => w -> s.replace(pat, rep).replace(pat, rep) }
        k += 1
      }
    }
    out.toSeq
  }

  private def runBpe(texts: Seq[String]): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }
      .toDF("doc_id", "source", "text")
    TextAnalysis.bpeTrainOf(spark, docs).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left_tok"),
        r.getAs[String]("right_tok"), r.getAs[Long]("pair_count")))
      .sortBy(_._1).toSeq
  }

  test("t24 matches the driver-side reference exactly on random corpora") {
    val rnd = new Random(29)
    val vocab = Seq("spark", "scan", "merge", "banana", "abab", "ll", "small",
      "a", "the", "query", "window", "hash")
    for (trial <- 1 to 3) {
      val texts = (1 to 30).map(_ =>
        (1 to (3 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      assert(runBpe(texts) == referenceBpe(texts), s"trial $trial")
      spark.catalog.clearCache()
    }
  }

  test("t24 two-pass replace takes boundary-sharing occurrences (abab)") {
    // 'abab' repeated: round 1 merges (a,b) with count 2/word — BOTH
    // occurrences, though they share a boundary space in the scan
    val texts = Seq.fill(5)("abab abab")
    val got = runBpe(texts)
    assert(got == referenceBpe(texts))
    assert(got.head._2 == "a" && got.head._3 == "b" && got.head._4 == 20L,
      s"round 1: ${got.head}")
    // round 2 must see (ab, ab) at full count — proof pass 2 merged the
    // second occurrence (one-pass scanning would leave ' ab a b ')
    assert(got(1)._2 == "ab" && got(1)._3 == "ab" && got(1)._4 == 10L,
      s"round 2: ${got(1)}")
    spark.catalog.clearCache()
  }

  test("t24 stops early when the vocab is fully merged") {
    // single distinct word of 3 symbols: 2 merges exhaust it
    val got = runBpe(Seq.fill(4)("abc abc"))
    assert(got.length == 2, s"$got")
    assert(got.map(m => (m._2, m._3)) == Seq(("a", "b"), ("ab", "c")))
    spark.catalog.clearCache()
  }

  // ─── t25 BPE application ─────────────────────────────────────────────

  /** Driver-side reference: learn via [[referenceBpe]], re-derive each
    * word's final sequence with the same two-pass replaces, count
    * symbols, and sum per doc.
    */
  private def referenceBpeApply(texts: Seq[String])
      : Map[Long, (Long, Long, Long)] = {
    val merges = referenceBpe(texts)
    def nSym(w: String): Long = {
      val seq0 = w.map(ch => s" $ch").mkString("", "", " ")
      val fin = merges.foldLeft(seq0) { case (s, (_, l, r, _)) =>
        val (pat, rep) = (s" $l $r ", s" $l$r ")
        s.replace(pat, rep).replace(pat, rep)
      }
      fin.trim.split(" ").length.toLong
    }
    texts.zipWithIndex.flatMap { case (t, i) =>
      val ws = "\\S+".r.findAllIn(t.toLowerCase).toSeq
      if (ws.isEmpty) None
      else Some(i.toLong ->
        ((ws.size.toLong, ws.map(_.length.toLong).sum, ws.map(nSym).sum)))
    }.toMap
  }

  test("t25 token counts match the driver-side learned-then-applied reference") {
    import spark.implicits._
    val rnd = new Random(31)
    val vocab = Seq("spark", "scan", "merge", "banana", "abab", "ll", "small",
      "a", "the", "query", "window", "hash")
    for (trial <- 1 to 2) {
      val texts = (1 to 25).map(_ =>
        (1 to (2 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }
        .toDF("doc_id", "source", "text")
      val got = TextAnalysis.bpeApplyOf(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
            r.getAs[Long]("n_tokens")))).toMap
      assert(got == referenceBpeApply(texts), s"trial $trial")
      spark.catalog.clearCache()
    }
  }

  test("t25 merged tokens never exceed chars and cover every non-empty doc") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val rows = TextAnalysis.bpeApplyOf(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"))
      // each word is ≥1 token; merging only ever shrinks the count
      assert(t >= w && t <= c, s"doc ${r.getAs[Long]("doc_id")}: w=$w c=$c t=$t")
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
    }
    spark.catalog.clearCache()
  }

  // ─── q62 cohort LTV ──────────────────────────────────────────────────

  /** Driver-side reference: BigDecimal money, quarter index arithmetic
    * in plain Scala — exact comparison incl. the 2-decimal rounding.
    */
  private def referenceCohort(orders: Seq[(Long, Long, java.sql.Timestamp, Double)])
      : Map[(Long, Long, Long), (Long, Long, Double, Long, Double)] = {
    def qidx(ts: java.sql.Timestamp): Long = {
      val c = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      c.setTime(ts)
      c.get(java.util.Calendar.YEAR).toLong * 4 + c.get(java.util.Calendar.MONTH) / 3
    }
    val first = orders.groupBy(_._2).map { case (cust, os) =>
      cust -> qidx(os.minBy(_._3.getTime)._3)
    }
    val cohortSize = first.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    orders.groupBy(o => (first(o._2), qidx(o._3) - first(o._2)))
      .map { case ((cidx, age), os) =>
        val rev = os.map(o => BigDecimal(o._4).setScale(3, BigDecimal.RoundingMode.HALF_UP))
          .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val active = os.map(_._2).distinct.size.toLong
        (cidx / 4, cidx % 4 + 1, age) ->
          ((active, os.size.toLong, rev.toDouble, cohortSize(cidx),
            active.toDouble / cohortSize(cidx)))
      }
  }

  test("q62 matches a driver-side BigDecimal reference exactly on random orders") {
    import spark.implicits._
    val rnd = new Random(37)
    val base = java.sql.Timestamp.valueOf("1995-01-15 00:00:00")
    val orders = (1L to 400L).map { k =>
      val cust = 1L + rnd.nextInt(40)
      val ts = new java.sql.Timestamp(
        base.getTime + rnd.nextInt(1200).toLong * 86400000L)
      (k, cust, ts, math.round(rnd.nextDouble() * 100000.0) / 100.0)
    }
    val df = orders.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.operators.Analytics2.cohortLtvOf(df).collect()
      .map(r => (r.getAs[Long]("cohort_year"), r.getAs[Long]("cohort_quarter"),
        r.getAs[Long]("age_quarters")) ->
        ((r.getAs[Long]("active_customers"), r.getAs[Long]("n_orders"),
          r.getAs[Double]("revenue"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention_share")))).toMap
    assert(got == referenceCohort(orders))
  }

  test("q62 age-0 actives equal cohort size and actives never exceed it") {
    val got = graft.operators.Analytics2.cohortLtv(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("active_customers") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Long]("age_quarters") >= 0)
      if (r.getAs[Long]("age_quarters") == 0L)
        // every cohort member's first order is in the cohort quarter
        assert(r.getAs[Long]("active_customers") == r.getAs[Long]("cohort_size"))
    }
  }
}
