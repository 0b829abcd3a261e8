package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, TestSpark.sf)
    val row = m.filter(_.media_id == 0).collect().head
    assert(row.kind == "image")
    assert(row.payload.length.toLong == row.meta_len) // ASCII text: 1 byte/char
  }

  test("extractFeatures is deterministic and partition-shaped") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, TestSpark.sf))
    val f = feats.filter(_.media_id == 0).collect().head
    assert(f.histogram.length == Multimodal.FakeCodec.HIST_BUCKETS)
    assert(f.histogram.sum == f.n_bytes)
    assert(f.mean_byte > 0)
    // re-run → identical hash (deterministic stub)
    val f2 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, TestSpark.sf))
      .filter(_.media_id == 0).collect().head
    assert(f.payload_hash == f2.payload_hash)
  }

  test("cell-batched extraction matches the plain path and co-locates cells") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaTable(spark, TestSpark.sf)
    val cells = graft.operators.Similarity.ivfAssign(spark, TestSpark.sf)
      .select(col("vec_id"), col("centroid_id"))
    val plain = Multimodal.extractFeatures(media)
      .collect().map(f => (f.media_id, f.payload_hash, f.n_bytes, f.mean_byte)).toSet
    val batched = Multimodal.extractFeaturesByCell(media, cells)
    val got = batched
      .collect().map(f => (f.media_id, f.payload_hash, f.n_bytes, f.mean_byte)).toSet
    assert(got == plain)
    // each IVF cell lands in exactly one partition (the memo-cache
    // locality); pid is stamped BELOW the verification join's shuffle
    // (spark_partition_id is nondeterministic, so it cannot be moved)
    val withPid = batched.toDF().withColumn("pid", spark_partition_id())
    val spread = withPid
      .join(cells.select(col("vec_id").as("media_id"), col("centroid_id")), Seq("media_id"))
      .groupBy("centroid_id").agg(countDistinct("pid").as("n_parts"))
      .where(col("n_parts") > 1).count()
    assert(spread == 0, "a cell was split across partitions")
  }

  test("resize truncates payloads; frameSample strides bytes") {
    val m = Multimodal.mediaTable(spark, TestSpark.sf)
    val r = Multimodal.resize(m, 16)
    assert(r.filter("not resized").count() == 0)
    val fs = Multimodal.frameSample(m.limit(2), 10)
    assert(fs.count() > 0)
    assert(fs.columns.toSet == Set("media_id", "frame_idx", "frame"))
  }
}
