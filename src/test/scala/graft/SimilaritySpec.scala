package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.plans.CosineSimilarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ivf k-means: every vector lands in exactly one of ≤16 cells") {
    val df = Similarity.ivfAssign(spark, TestSpark.sf)
    val n = Tables.embeddings(spark, TestSpark.sf).count()
    assert(df.count() == n)
    assert(df.select("vec_id").distinct().count() == n)
    assert(df.select("centroid_id").distinct().count() <= 16)
    // cell_size is consistent with the actual assignment
    val bad = df.groupBy("centroid_id")
      .agg(count(lit(1)).as("actual"), max("cell_size").as("claimed"))
      .where(col("actual") =!= col("claimed")).count()
    assert(bad == 0)
  }

  test("Lloyd refinement does not degrade mean assignment cosine vs the seed codebook") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("emb"))
    val c0 = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("emb").as("c_emb"))
    val init = e.crossJoin(c0)
      .select(col("vec_id"),
        round(CosineSimilarity.cosineSim(col("emb"), col("c_emb")), 4).as("cos_r"))
      .groupBy("vec_id").agg(max("cos_r").as("best"))
      .agg(avg("best")).collect().head.getDouble(0)
    val refined = Similarity.ivfAssign(spark, TestSpark.sf)
      .agg(avg("cos_to_centroid")).collect().head.getDouble(0)
    assert(refined >= init - 1e-9,
      s"refined codebook ($refined) worse than seed codebook ($init)")
  }

  test("multi-probe recall report: recall and scan cost are monotone in nprobe") {
    val rows = Similarity.ivfSearchRecall(spark, TestSpark.sf)
      .orderBy("nprobe").collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getAs[Double]("recall_at5"))
    val cands = rows.map(_.getAs[Double]("avg_candidates"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: ${recalls.toSeq}")
    assert(cands.zip(cands.tail).forall { case (a, b) => a < b },
      s"scan cost not increasing: ${cands.toSeq}")
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
  }
}
