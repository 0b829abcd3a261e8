package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Similarity search over the embedding corpus:
  *
  *  - d05 brute-force cosine top-k — the exact ANN baseline: a bounded
  *    query set joined against the full corpus, cosine via native
  *    higher-order functions, per-query top-k window. At cluster scale
  *    the query set broadcasts and the corpus streams — no shuffle of
  *    the big side, wall-clock linear in corpus size.
  *  - d06 random-hyperplane LSH — the scale path: 8 deterministic
  *    hyperplanes (sign pattern derived from md5, so any engine can
  *    reproduce them), sign-bit bucketing; neighbor candidates are
  *    in-bucket only, turning O(n²) search into bucket-local work.
  *
  * Ranking determinism: ranks are computed on ROUND(cos, 4) with vec_id
  * tiebreak, so ordering never depends on sub-ULP float noise.
  */
object Similarity {

  // ─── d05 brute-force cosine top-k ────────────────────────────────────
  def embeddingKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = e.select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
    // fused single-pass scorer (custom codegen Expression); bit-identical
    // to VectorFunctions.cosine (same index-ordered folds)
    val scored = corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(graft.plans.CosineSimilarity.cosineSim(col("q_emb"), col("c_emb")), 4)
          .as("cosine_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
  }

  // ─── d06 random-hyperplane LSH bucketing ─────────────────────────────
  def embeddingLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // (vec_id, label, d (1-based), v) — one row per vector component
    val comps = e.select(col("vec_id"), col("label"),
        posexplode(asDouble(col("embedding"))).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("d"), col("v"))
    // deterministic hyperplane sign for (plane j, dim d): high hex bit of md5
    val withJ = comps.select(col("vec_id"), col("label"), col("d"), col("v"),
      explode(sequence(lit(0), lit(7))).as("j"))
    val sign = when(
      md5(concat(lit("hp_"), col("j").cast("string"), lit("_"), col("d").cast("string")))
        .substr(1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1.0).otherwise(-1.0)
    val bits = withJ
      .groupBy(col("vec_id"), col("label"), col("j"))
      .agg((sum(col("v") * sign) > 0).cast("long").as("bit"))
    val buckets = bits.groupBy(col("vec_id"), col("label"))
      .agg(sum(col("bit") * round(pow(lit(2.0), col("j")), 0).cast("long")).as("lsh_bucket"))
    val wb = Window.partitionBy(col("lsh_bucket"))
    buckets.withColumn("bucket_size", count(lit(1)).over(wb))
      .withColumn("label", col("label").cast("long"))
  }

  // ─── q24 IVF coarse quantization (the ANN index-build stage) ─────────
  /** Inverted-file ANN, build stage: a deterministic coarse codebook
    * (the first 16 corpus vectors — a stand-in for k-means centroids,
    * which would be refined offline) and nearest-centroid assignment.
    * Search then probes only the query's cell(s) — the d05 brute-force
    * scorer applied within a cell — turning corpus-wide scans into
    * 1/16th-sized bucket scans at 100 TB.
    */
  def ivfAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("emb").as("c_emb"))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        round(graft.plans.CosineSimilarity.cosineSim(col("emb"), col("c_emb")), 4)
          .as("cos_r"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_r").desc, col("centroid_id"))
    val assigned = scored.withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("cos_r").as("cos_to_centroid"))
    assigned.withColumn("cell_size",
      count(lit(1)).over(Window.partitionBy(col("centroid_id"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d05_embedding_knn" -> embeddingKnn,
    "d06_embedding_lsh" -> embeddingLsh,
    "q24_ivf_ann" -> ivfAssign)

  val oracle: Map[String, String] = Map(
    "q24_ivf_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |cent AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, cent.centroid_id,
        |         round(list_dot_product(e.emb, cent.c_emb)
        |               / (sqrt(list_dot_product(e.emb, e.emb))
        |                  * sqrt(list_dot_product(cent.c_emb, cent.c_emb))), 4) AS cos_r
        |  FROM e CROSS JOIN cent),
        |assigned AS (
        |  SELECT vec_id, centroid_id, cos_r AS cos_to_centroid,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY cos_r DESC, centroid_id) AS rn
        |  FROM scored)
        |SELECT vec_id, centroid_id, cos_to_centroid,
        |       count(*) OVER (PARTITION BY centroid_id) AS cell_size
        |FROM assigned WHERE rn = 1""".stripMargin,
    "d05_embedding_knn" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.q_id, c.vec_id AS c_id,
        |         round(list_dot_product(q.q_emb, c.emb)
        |               / (sqrt(list_dot_product(q.q_emb, q.q_emb))
        |                  * sqrt(list_dot_product(c.emb, c.emb))), 4) AS cosine_sim
        |  FROM q JOIN e c ON q.q_id <> c.vec_id)
        |SELECT q_id, c_id, cosine_sim,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY cosine_sim DESC, c_id) AS BIGINT) AS rank
        |FROM scored
        |QUALIFY rank <= 10""".stripMargin,
    "d06_embedding_lsh" ->
      """WITH comps AS (
        |  SELECT vec_id, label,
        |         unnest(range(1, len(embedding) + 1)) AS d,
        |         unnest(CAST(embedding AS DOUBLE[])) AS v
        |  FROM embeddings),
        |js AS (SELECT unnest(range(0, 8)) AS j),
        |bits AS (
        |  SELECT vec_id, label, j,
        |         CAST(sum(v * (CASE WHEN substr(md5('hp_' || j || '_' || d), 1, 1)
        |                            IN ('8','9','a','b','c','d','e','f')
        |                       THEN 1.0 ELSE -1.0 END)) > 0 AS BIGINT) AS bit
        |  FROM comps CROSS JOIN js GROUP BY 1, 2, 3),
        |buckets AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         CAST(sum(bit * CAST(round(power(2, j), 0) AS BIGINT)) AS BIGINT) AS lsh_bucket
        |  FROM bits GROUP BY 1, 2)
        |SELECT vec_id, label, lsh_bucket,
        |       count(*) OVER (PARTITION BY lsh_bucket) AS bucket_size
        |FROM buckets""".stripMargin)
}
