package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.QualityStream

/** Top-level so the MemoryStream encoder needs no outer scope. */
private case class QsDoc(doc_id: Long, source: String, text: String)

/** Model serving on the stream must score EXACTLY as the batch scorer:
  * the frozen ridge coefficients ride into the streaming projection as
  * literals, so every arriving doc's (score, keep) must equal the
  * batch pass over the same corpus however the feed is chopped into
  * micro-batches.
  */
class QualityStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed ridge scoring == batch scoring across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val model = QualityStream.trainModel(spark, TestSpark.sf)
    assert(model.length == graft.operators.TextAnalysis.RidgeDims)
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("text")).as[QsDoc]
      .collect().toSeq
    assert(docs.nonEmpty)

    val src = MemoryStream[QsDoc]
    val out = java.nio.file.Files.createTempDirectory("graft_quality_stream").toString
    val q = QualityStream.run(
      QualityStream.scored(src.toDF(), model), s"$out/scored", s"$out/ckpt")
    try {
      docs.grouped(math.max(1, docs.size / 3)).foreach { chunk =>
        src.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("weak_label"), r.getAs[Double]("score"),
        r.getAs[Boolean]("keep"))
    val streamed = spark.read.parquet(s"$out/scored").collect().map(key).sorted
    val batch = QualityStream.scored(
      graft.sources.Tables.documents(spark, TestSpark.sf), model)
      .collect().map(key).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"stream scored ${streamed.length} rows vs batch ${batch.length}")
    // the stream side never aggregates: a stateless projection is the
    // property that lets it run without watermarks or state store
    val plan = QualityStream.scored(src.toDF(), model)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      s"streamed scorer must be a pure projection:\n$plan")
  }
}
