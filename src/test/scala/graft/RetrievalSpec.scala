package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Property pins for the round-12 retrieval serving rows: q68's reason
  * to exist (exact re-ranking recovers recall the PQ approximation
  * loses) and q67's scale claim (chunk text materializes only for
  * retrieved docs).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def top5(rows: Array[org.apache.spark.sql.Row], idCol: String) =
    rows.groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long](idCol)).toSet).toMap

  test("q68 re-rank recall against the exact baseline is >= raw PQ's, and " +
      "within-candidate ordering is exactly by true cosine") {
    val exact = top5(Similarity.embeddingKnn(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("rank") <= 5).collect(), "c_id")
    val pq = top5(Similarity.pqSearch(spark, TestSpark.sf).collect(), "c_id")
    val rr = top5(Similarity.pqRerank(spark, TestSpark.sf).collect(), "c_id")
    assert(rr.keySet == pq.keySet && rr.keySet.nonEmpty)
    def hits(m: Map[Long, Set[Long]]) =
      m.map { case (q, s) => (s & exact.getOrElse(q, Set.empty)).size }.sum
    assert(hits(rr) >= hits(pq),
      s"re-rank must not lose recall: rerank=${hits(rr)} pq=${hits(pq)}")
    // the served list is ordered by EXACT cosine (rank == exact_cos order)
    val rows = Similarity.pqRerank(spark, TestSpark.sf).collect()
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Double]("exact_cos"), -r.getAs[Long]("c_id")))
      assert(byRank.sameElements(byRank.sortBy(t => (-t._1, -t._2))),
        "rank must follow exact_cos desc, c_id asc")
    }
    spark.catalog.clearCache()
  }

  test("q67 serves at most 10 chunks per query from at most its top-5 docs, " +
      "and chunk rows agree with t21's chunking of those docs") {
    import org.apache.spark.sql.functions.col
    val served = Similarity.chunkRetrieval(spark, TestSpark.sf).collect()
    assert(served.nonEmpty)
    val byQ = served.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { g =>
      assert(g.length <= 10)
      assert(g.map(_.getAs[Long]("doc_id")).toSet.size <= 5)
      assert(g.forall(_.getAs[Long]("doc_rank")  <= 5))
    }
    // chunk geometry matches t21 for a served doc
    val doc = served.head.getAs[Long]("doc_id")
    val t21 = graft.operators.TextAnalysis.chunkDocuments(spark, TestSpark.sf)
      .filter(col("doc_id") === doc).collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_start"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text"))).toSet
    served.filter(_.getAs[Long]("doc_id") == doc).foreach { r =>
      assert(t21.contains((r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_start"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text"))))
    }
    spark.catalog.clearCache()
  }
}
