package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Events, TextAnalysis}

class TextEventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("token counts: bpe-ish >= whitespace tokens, ratios sane") {
    TextAnalysis.tokenCount(spark, TestSpark.sf).collect().foreach { r =>
      assert(r.getAs[Long]("bpe_ish_tokens") >= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Double]("chars_per_token") > 0)
    }
  }

  test("quality score is in [0, 1]") {
    val bad = TextAnalysis.qualityScore(spark, TestSpark.sf)
      .filter(col("quality_score") < 0 || col("quality_score") > 1).count()
    assert(bad == 0)
  }

  test("fingerprint dup ranks start at 1 per fingerprint") {
    val fp = TextAnalysis.fingerprintDocs(spark, TestSpark.sf)
    val firsts = fp.groupBy("fingerprint").agg(min("dup_rank").as("m"))
      .filter(col("m") =!= 1).count()
    assert(firsts == 0)
  }

  test("sessions: duration >= 0, events partition into sessions") {
    val sess = Events.sessionize(spark, TestSpark.sf)
    assert(sess.filter(col("duration_sec") < 0).count() == 0)
    val nEvents = spark.read.parquet(s"${TestSpark.sf}/events.parquet").count()
    assert(sess.agg(sum("n_events")).collect().head.getLong(0) == nEvents)
  }

  test("tumbling windows partition all events") {
    val n = Events.tumblingWindows(spark, TestSpark.sf)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(n == spark.read.parquet(s"${TestSpark.sf}/events.parquet").count())
  }
}
