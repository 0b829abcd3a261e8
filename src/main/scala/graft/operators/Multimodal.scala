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

    /** 8×8 grayscale thumbnail (row-major, 64 ints in [0, 255]) — the
      * downsample a perceptual hash ([[perceptualHash]]) is built on.
      * Pure, like [[decode]]: equal payloads must produce equal tiles.
      * Default (for byte-oriented stand-in codecs): average byte value
      * over 64 equal payload slices — deterministic, and (like a real
      * thumbnail) stable under small payload perturbations away from
      * slice boundaries. A real image codec overrides with a true
      * block-averaged raster ([[ImageIoCodec.grayTile]]).
      */
    def grayTile(payload: Array[Byte]): Array[Int] = {
      val tile = new Array[Int](64)
      if (payload.isEmpty) return tile
      var k = 0
      while (k < 64) {
        val from = (k.toLong * payload.length / 64).toInt
        val until = ((k + 1).toLong * payload.length / 64).toInt
        if (until > from) {
          var s = 0L
          var i = from
          while (i < until) { s += payload(i) & 0xff; i += 1 }
          tile(k) = (s / (until - from)).toInt
        }
        k += 1
      }
      tile
    }
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

    /** Real 8×8 luma thumbnail: block-average the decoded raster (each
      * tile averages its ⌈h/8⌉×⌈w/8⌉ pixel block, integer ITU-R 601
      * luma) — the classic aHash downsample. Integer arithmetic
      * throughout ⇒ bit-deterministic across JVMs.
      */
    override def grayTile(payload: Array[Byte]): Array[Int] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"undecodable image payload (${payload.length} bytes)")
      val (w, h) = (img.getWidth, img.getHeight)
      val tile = new Array[Int](64)
      var ty = 0
      while (ty < 8) {
        var tx = 0
        while (tx < 8) {
          val (x0, x1) = (tx * w / 8, math.max((tx + 1) * w / 8, tx * w / 8 + 1))
          val (y0, y1) = (ty * h / 8, math.max((ty + 1) * h / 8, ty * h / 8 + 1))
          var s = 0L
          var n = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = img.getRGB(x, y)
              s += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              n += 1
              x += 1
            }
            y += 1
          }
          tile(ty * 8 + tx) = if (n == 0) 0 else (s / n).toInt
          tx += 1
        }
        ty += 1
      }
      tile
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

  case class MediaHash(media_id: Long, phash: Long)

  /** Perceptual average-hash (aHash) per media row: 8×8 grayscale
    * thumbnail via the codec seam, bit k set iff tile(k) > the tile
    * mean (integer floor — deterministic ties). Equal payloads hash
    * equal; small visual perturbations flip few bits, so near-dup
    * images sit at small hamming distance — the image-space analog of
    * d04's text SimHash. Same per-partition codec-init shape as
    * [[extractFeatures]] (the decode is the dominant cost; the hash
    * is 64 integer compares on top).
    */
  def perceptualHash(media: Dataset[MediaRow],
                     codecFactory: () => MediaCodec = () => FakeCodec): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = codecFactory()
      rows.map { r =>
        val tile = codec.grayTile(r.payload)
        val mean = tile.map(_.toLong).sum / 64
        var h = 0L
        var k = 0
        while (k < 64) {
          if (tile(k) > mean) h |= (1L << k)
          k += 1
        }
        MediaHash(r.media_id, h)
      }
    }
  }

  /** Near-duplicate image pairs at hamming ≤ `maxHamming` over the
    * aHash, found by d04's banded-SimHash discipline: the 64-bit hash
    * splits into four 16-bit bands; by pigeonhole any pair within
    * hamming ≤ 3 agrees EXACTLY on ≥ 1 band (lossless there; at the
    * default 6 the bands are a high-recall blocking heuristic, the
    * LSH trade d03/d04 document), so candidates come from four
    * equi-self-joins on (band index, band value) — never an all-pairs
    * compare — and the exact hamming check runs on the candidate
    * slice only. Identical-hash pairs agree on every band; `distinct`
    * collapses the multi-band hits.
    */
  def phashNearDup(hashes: Dataset[MediaHash], maxHamming: Int = 6): DataFrame = {
    val bands = hashes.toDF().select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("shiftright(phash, band * 16) & 65535"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("media_a"), col("media_b"), col("hamming"))
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
