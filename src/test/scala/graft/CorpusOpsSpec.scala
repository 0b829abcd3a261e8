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
}
