package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column pipeline plumbing: opaque `binary` payloads with
  * typed metadata, partition-wise feature extraction, and
  * resize/frame-sample stages.
  *
  * The codec itself is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec.decode]] is a deterministic stand-in that
  * derives a byte histogram from the payload. Everything AROUND the stub
  * is real and scale-shaped: binary columns travel in parquet row
  * groups, feature extraction is `mapPartitions` (one codec init per
  * partition, the same batch shape a JNI/FFI decoder needs), and the
  * output schema is fixed and columnar.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, format: String,
                      payload: Array[Byte], meta_len: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           mean_byte: Double, histogram: Array[Long],
                           payload_hash: String)

  /** The codec injection seam: a production decoder implements this and
    * drops in WITHOUT touching any partitioning/shuffle logic — the
    * extraction stages take a FACTORY (`() => MediaCodec`) and invoke it
    * once per partition inside `mapPartitions`, which is where a JNI/FFI
    * decoder does its heavy native init (the factory closure ships to
    * executors; the live codec never crosses the wire). Per-row
    * `decode` must be pure: the memo cache and the stream==batch
    * differentials assume equal payloads produce equal features.
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte]): (Double, Array[Long])
  }

  /** Deterministic stand-in for a real image/audio decoder (this
    * container ships no image/audio libraries). A production build
    * injects JNI/FFI bindings via [[MediaCodec]]; the Spark-side
    * contract (bytes in, fixed-width features out, initialized once per
    * partition) is unchanged — MultimodalSpec runs a second codec
    * through the same plumbing to pin that.
    */
  object FakeCodec extends MediaCodec {
    val HIST_BUCKETS = 16
    def decode(payload: Array[Byte]): (Double, Array[Long]) = {
      val hist = new Array[Long](HIST_BUCKETS)
      var sum = 0L
      payload.foreach { b =>
        val u = b & 0xff
        hist(u / HIST_BUCKETS) += 1
        sum += u
      }
      val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
      (mean, hist)
    }
  }

  /** REAL pure-JVM image codec over `javax.imageio` — the JDK's
    * built-in readers (PNG/BMP/GIF/JPEG), no native libraries: decode
    * actual image bytes to (mean luminance, 16-bucket luminance
    * histogram), the same fixed-width feature shape as [[FakeCodec]],
    * so it drops through every extraction stage unchanged
    * (MultimodalSpec runs it over real PNG bytes per-cell and pins
    * memo behavior). Luma is the integer ITU-R 601 weighting
    * ((299·R + 587·G + 114·B) / 1000) — pure integer arithmetic, so
    * features are bit-deterministic across JVMs; ImageIO.read itself
    * is a strict format decoder (same bytes → same raster).
    *
    * Object-level (one per JVM) rather than per-call init — ImageIO's
    * plugin registry scan is the "heavy native init" the per-partition
    * factory contract exists for.
    */
  object ImageIoCodec extends MediaCodec {
    def decode(payload: Array[Byte]): (Double, Array[Long]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"undecodable image payload (${payload.length} bytes)")
      val hist = new Array[Long](FakeCodec.HIST_BUCKETS)
      var sum = 0L
      var n = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum / FakeCodec.HIST_BUCKETS) += 1
          sum += lum
          n += 1
          x += 1
        }
        y += 1
      }
      (if (n == 0) 0.0 else sum.toDouble / n, hist)
    }
  }

  /** Synthesize a media table from the documents corpus: payload =
    * UTF-8 bytes of the text (a deterministic opaque binary stand-in
    * for real image bytes).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        lit("fake/raw").as("format"),
        encode(col("text"), "UTF-8").as("payload"),
        col("n_chars").as("meta_len"))
      .as[MediaRow]
  }

  /** Partition-wise feature extraction: one codec "initialization" per
    * partition, then a streamed map over rows — the shape a real decoder
    * (heavy init, cheap per-row call) requires. No collect, no UDF
    * per-row closure capture.
    */
  def extractFeatures(media: Dataset[MediaRow],
                      codecFactory: () => MediaCodec = () => FakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: the codec (factory call = heavy native init
      // for a real decoder) AND the digest instance (a MessageDigest
      // resets on digest(), so one instance serves the whole partition
      // — no per-row allocation)
      val codec = codecFactory()
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (mean, hist) = codec.decode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, mean, hist,
          md5.digest(r.payload).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Feature extraction CO-PARTITIONED BY (IVF cell, payload salt)
    * (`cells` is the q24 assignment, vec_id → centroid_id): media whose
    * embeddings share a coarse cell are overwhelmingly near-identical
    * payloads, so shuffling them together makes the per-partition decode
    * memo-cache actually hit — each distinct payload decodes ONCE per
    * partition instead of once per row. That
    * shuffle-cheap-rows-before-expensive-per-row-work trade is the real
    * 100 TB pattern (decode dominates by orders of magnitude; the
    * shuffle moves only bytes).
    *
    * The partition key is (cell, salt) — NOT cell alone, which would cap
    * decode parallelism at the number of cells (≤17 active partitions at
    * ANY corpus size, a scale-killer for the one operator whose whole
    * point is decode throughput). The salt derives from the payload
    * itself (`hash(payload) mod saltBuckets`), so IDENTICAL payloads
    * still land in one partition and every memo hit is preserved — the
    * memo is keyed by payload digest and can only ever hit on exact
    * equality. Media without a vector fall into a catch-all cell.
    * Output rows are identical to [[extractFeatures]] (asserted in
    * MultimodalSpec) — only the physical grouping differs.
    *
    * `numPartitions` pins the shuffle's partition count (defaults to
    * `spark.sql.shuffle.partitions`) — at cluster scale set it to a
    * multiple of the executor-core count.
    */
  def extractFeaturesByCell(media: Dataset[MediaRow], cells: DataFrame,
                            saltBuckets: Int = 64,
                            numPartitions: Option[Int] = None,
                            codecFactory: () => MediaCodec = () => FakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val withCell = media.toDF()
      .join(cells.select(col("vec_id").as("media_id"), col("centroid_id")),
        Seq("media_id"), "left")
      .withColumn("cell", coalesce(col("centroid_id"), lit(-1L)))
    val keys = Seq(col("cell"), pmod(hash(col("payload")), lit(saltBuckets)))
    numPartitions.map(n => withCell.repartition(n, keys: _*))
      .getOrElse(withCell.repartition(keys: _*))
      .select(col("media_id"), col("kind"), col("format"), col("payload"), col("meta_len"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val codec = codecFactory()
        val md5 = java.security.MessageDigest.getInstance("MD5")
        // memo keyed by payload digest: near-dup cells make this hit
        val memo = scala.collection.mutable.HashMap.empty[String, (Double, Array[Long])]
        rows.map { r =>
          val hash = md5.digest(r.payload).map("%02x".format(_)).mkString
          val (mean, hist) = memo.getOrElseUpdate(hash, codec.decode(r.payload))
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, mean, hist, hash)
        }
      }
  }

  /** "Resize" stage stub: truncate payloads to `maxBytes` — stands in
    * for image resize / audio clip; demonstrates a narrow binary-column
    * transform that never leaves the executor.
    */
  def resize(media: Dataset[MediaRow], maxBytes: Int): DataFrame =
    media.toDF()
      .withColumn("payload", expr(s"substring(payload, 1, $maxBytes)"))
      .withColumn("resized", length(col("payload")) <= maxBytes)

  /** Frame-sampling stub: pick every `stride`-th byte — stands in for
    * video frame sampling keeping the 1:N row explosion shape.
    */
  def frameSample(media: Dataset[MediaRow], stride: Int): DataFrame =
    media.toDF().select(
      col("media_id"),
      posexplode(expr(s"filter(transform(sequence(1, int(length(payload))), i -> " +
        s"CASE WHEN (i - 1) % $stride = 0 THEN substring(payload, i, 1) END), x -> x IS NOT NULL)"))
        .as(Seq("frame_idx", "frame")))
}
