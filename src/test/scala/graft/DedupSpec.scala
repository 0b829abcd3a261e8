package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact dedup groups cover the corpus exactly once") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val groups = Dedup.exactDedup(spark, TestSpark.sf)
    assert(groups.agg(sum("dup_count")).collect().head.getLong(0) == docs.count())
    // keep ids are real doc ids
    assert(groups.join(docs, col("keep_doc_id") === col("doc_id"), "left_anti").count() == 0)
  }

  test("jaccard pairs are ordered, bounded, and above threshold") {
    val pairs = Dedup.ngramJaccard(spark, TestSpark.sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.2 && j <= 1.0)
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("union_n"))
    }
  }

  test("minhash candidates contain the high-jaccard pairs (LSH recall)") {
    val exact = Dedup.ngramJaccard(spark, TestSpark.sf)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashLsh(spark, TestSpark.sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every near-identical pair must be an LSH candidate
    assert(exact.subsetOf(cand), s"missed: ${exact -- cand}")
  }

  test("published candidate artifact is deterministic across rebuild and reuse") {
    // first call may build, second publishes again over it; the artifact
    // is a pure function of the source so both reads must be identical
    // (materialize the first read before the re-publish replaces files)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("n_shared_bands"))
    val first = Dedup.minhashLsh(spark, TestSpark.sf).collect().map(key).sorted
    val again = Dedup.minhashLsh(spark, TestSpark.sf).collect().map(key).sorted
    assert(first.nonEmpty && first.sameElements(again))
  }

  test("simhash is a 16-bit value with consistent bands") {
    Dedup.simhash(spark, TestSpark.sf).collect().foreach { r =>
      val s = r.getAs[Long]("simhash")
      assert(s >= 0 && s < 65536)
      assert(r.getAs[Long]("band_hi") == s / 256)
      assert(r.getAs[Long]("band_lo") == s % 256)
    }
  }

  test("d10 mixture reconciles with the d07 removal list") {
    import org.apache.spark.sql.functions._
    val removal = Dedup.dedupPipeline(spark, TestSpark.sf)
    val mix = Dedup.effectiveMixture(spark, TestSpark.sf)
    // the mixture's removed-doc total IS the survivorship list's size —
    // both derive from the same verified-pair artifact
    assert(mix.agg(sum("n_removed")).collect().head.getLong(0) == removal.count())
    // kept never exceeds raw; shares stay in (0, 1]
    assert(mix.filter(col("tokens_kept") > col("tokens_total") ||
      col("n_removed") > col("n_docs") ||
      col("pct_tokens_kept") <= 0 || col("pct_tokens_kept") > 1).count() == 0)
  }

  test("d12 clusters are closed over the d07 removal pairs") {
    val assign = Dedup.dupClusterAssignment(spark, TestSpark.sf)
    val removal = Dedup.dedupPipeline(spark, TestSpark.sf)
    // transitivity: every (removed, kept_partner) pair from the pairwise
    // survivorship list must land in the SAME connected component
    val crossCluster = removal
      .join(assign.withColumnRenamed("doc_id", "removed_doc_id")
        .withColumnRenamed("cluster_id", "c_removed"), Seq("removed_doc_id"))
      .join(assign.withColumnRenamed("doc_id", "kept_partner")
        .withColumnRenamed("cluster_id", "c_kept"), Seq("kept_partner"))
    assert(crossCluster.count() == removal.count())
    assert(crossCluster.filter(col("c_removed") =!= col("c_kept")).count() == 0)
    // labels are the component minimum: the label itself is a member,
    // and no member is smaller
    assert(assign.filter(col("doc_id") < col("cluster_id")).count() == 0)
    assert(assign.filter(col("doc_id") === col("cluster_id")).count() ==
      assign.select("cluster_id").distinct().count())

    val report = Dedup.dupClusters(spark, TestSpark.sf)
    val rows = report.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nPairs) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pairs"))
      assert(nDocs >= 2 && r.getAs[Long]("n_removed") == nDocs - 1)
      // connectivity needs a spanning tree; pairs can't exceed all-pairs
      assert(nPairs >= nDocs - 1 && nPairs <= nDocs * (nDocs - 1) / 2)
      val j = r.getAs[Double]("max_jaccard")
      assert(j >= 0.5 && j <= 1.0)
      val nSources = r.getAs[Long]("n_sources")
      assert(nSources >= 1 && nSources <= nDocs)
    }
    // the report covers exactly the assigned docs
    assert(rows.map(_.getAs[Long]("n_docs")).sum == assign.count())
  }
}
