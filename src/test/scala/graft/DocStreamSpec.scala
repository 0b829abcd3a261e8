package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DocStream, EventsStream}
import graft.streaming.DocStream.Doc

class DocStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val docs = Seq(
    Doc(1, "src0", "en", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:00:00")),
    Doc(2, "src1", "en", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:05:00")), // dup of 1
    Doc(3, "src0", "de", "ein ganz anderer text mit anderen worten hier", ts("2024-01-01 10:10:00")),
    Doc(4, "src2", "en", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:20:00")), // dup of 1
    Doc(5, "src1", "de", "noch ein dritter eindeutiger inhalt im strom", ts("2024-01-01 10:30:00")))

  test("streaming dedup ingest keeps the first arrival per fingerprint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    // two micro-batches, arrival order follows doc_id
    src.addData(docs.take(3): _*)
    src.addData(docs.drop(3): _*)
    val out = EventsStream.runToMemory(
      DocStream.dedupIngest(src.toDF()), "dedup_ingest", OutputMode.Append())
    val kept = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 3L, 5L))
    // agrees with the batch keep-first (min doc_id) on the same frame
    val batchKept = docs.toDF().groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("keep")).collect().map(_.getAs[Long]("keep")).toSet
    assert(kept == batchKept)
  }

  test("static frame through the same operator is its own batch twin") {
    import spark.implicits._
    val kept = DocStream.dedupIngest(docs.toDF())
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.size == 3)
    // one survivor per distinct content, every survivor a real doc id
    assert(kept.subsetOf(docs.map(_.doc_id).toSet))
  }

  test("quality gate screens junk before dedup state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val junk = Seq(
      Doc(10, "src0", "xx", "1234567890 9876543210 0000000", ts("2024-01-01 11:00:00")), // numeric
      Doc(11, "src0", "xx", "tiny", ts("2024-01-01 11:01:00")), // too short
      Doc(12, "src0", "en", // degenerate repetition loop: 1 distinct word in 20
        Seq.fill(20)("spam").mkString(" "), ts("2024-01-01 11:02:00")))
    val src = MemoryStream[Doc]
    src.addData(docs ++ junk: _*)
    val out = EventsStream.runToMemory(
      DocStream.gatedIngest(src.toDF()), "gated_ingest", OutputMode.Append())
    val kept = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 3L, 5L))
    // the static frame through the same gate agrees (stream == batch)
    val batchKept = DocStream.gatedIngest((docs ++ junk).toDF())
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(batchKept == kept)
  }

  test("randomized differential: stream gate == independent batch-rule recomputation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 200 random docs exercising every rule edge: repetition loops,
    // numeric/punctuation blobs, short strings, leading/trailing
    // whitespace (the tokenizer trap: split-on-\s+ sees a phantom empty
    // token where t06's \S+ extraction does not), and exact duplicates
    // across different doc_ids
    val rnd = new scala.util.Random(20250813)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "123", "!!", "x9", "the", "quick", "fox")
    val frame = (0 until 200).map { i =>
      val text =
        if (i % 5 == 4) s"duplicate content body ${i % 7} repeated here" // cross-id dups
        else {
          val n = 1 + rnd.nextInt(30)
          val pool = if (rnd.nextInt(4) == 0) vocab.take(1 + rnd.nextInt(2)) else vocab
          val body = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
          ("  " * rnd.nextInt(2)) + body + ("  " * rnd.nextInt(2))
        }
      Doc(i.toLong, s"src${i % 3}", "en", text, ts("2024-01-01 10:00:00"))
    }
    // independent driver-side recomputation of the gate rules (plain
    // string ops, not Spark expressions — a genuine second
    // implementation of minChars=20 / alphaRatio>=0.5 / dupWordFrac<=0.85)
    def passes(s: String): Boolean = {
      val ws = "\\S+".r.findAllIn(s).toSeq
      s.length >= 20 &&
        s.count(_.isLetter).toDouble / s.length >= 0.5 &&
        ws.nonEmpty && (1.0 - ws.distinct.size.toDouble / ws.size) <= 0.85
    }
    val expectedTexts = frame.filter(d => passes(d.text)).map(_.text).toSet
    val idsByText = frame.groupBy(_.text).map { case (t, ds) => t -> ds.map(_.doc_id).toSet }
    val src = MemoryStream[Doc]
    src.addData(frame: _*)
    val out = EventsStream.runToMemory(
      DocStream.gatedIngest(src.toDF()), "gated_diff", OutputMode.Append()).collect()
    // gate differential: exactly the rule-passing contents survive,
    // exactly once each (dedup arrival-order identity is pinned by the
    // ordered-batch tests above; here ids need only be real holders)
    val keptTexts = out.map(_.getAs[String]("text"))
    assert(keptTexts.toSet == expectedTexts,
      s"stream-only: ${keptTexts.toSet -- expectedTexts}; batch-only: ${expectedTexts -- keptTexts.toSet}")
    assert(keptTexts.length == keptTexts.toSet.size, "one survivor per distinct content")
    out.foreach { r =>
      assert(idsByText(r.getAs[String]("text")).contains(r.getAs[Long]("doc_id")))
    }
    assert(expectedTexts.nonEmpty && expectedTexts.size < frame.size,
      "differential must exercise both kept and dropped docs")
  }
}
