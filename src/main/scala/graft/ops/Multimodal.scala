package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface, SURVEY.md §2.11):
  * image/audio/video payloads are opaque `binary` columns with a typed
  * metadata struct alongside. The Spark-side mechanics — schema,
  * partition-friendly layout, per-row transforms, content hashing for
  * dedup — are real; the codec step is a clearly-marked deterministic
  * stand-in because no media libraries ship in this container.
  *
  * At scale the payload column dominates bytes: keep it out of every
  * shuffle (operate on `media_sha` / metadata, join payloads back by
  * key only at the edges) and rely on parquet column pruning so
  * metadata-only queries never read the blob pages.
  */
object Multimodal {

  /** Attach a synthetic media payload + typed metadata to each doc.
    * Production equivalent: `spark.read.format("binaryFile")` per
    * object, or a manifest table of (uri, offset, len) pointers.
    */
  def withMedia(docs: DataFrame): DataFrame = docs
    .withColumn("media", encode(col("text"), "UTF-8")) // stand-in payload bytes
    .withColumn("media_meta", struct(
      octet_length(col("media")).as("n_bytes"),
      lit("application/octet-stream").as("mime"),
      lit(16000).as("sample_rate")))

  /** Content-addressed metadata per payload: byte length + SHA-256 —
    * the exact-dedup / cache key for binary columns.
    */
  def mediaStats(docs: DataFrame): DataFrame =
    withMedia(docs).select(
      col("doc_id"),
      col("media_meta.n_bytes").cast("long").as("n_bytes"),
      sha2(col("media"), 256).as("media_sha"))

  /** STUB feature extraction (`decode → features`): a real pipeline
    * would decode the payload (libjpeg/ffmpeg etc. — not available
    * here) and emit a float vector; this deterministic fake derives
    * `dim` codepoint-based features so the schema, batching, and
    * downstream similarity plumbing are fully exercisable.
    */
  def fakeFeatures(docs: DataFrame, dim: Int = 8): DataFrame =
    withMedia(docs).select(
      col("doc_id"),
      transform(sequence(lit(1), lit(dim)),
        i => coalesce(ascii(substring(col("text"), 1, 1024).substr(i, lit(1))), lit(0))
          .cast("float"))
        .as("features"))

  /** Resize/downsample analog over the binary payload: keep every
    * `factor`-th byte (a real image resize would decode → scale →
    * re-encode; the byte-level stand-in keeps the schema + per-row
    * transform shape honest while codecs are unavailable).
    */
  def downsample(docs: DataFrame, factor: Int = 4): DataFrame =
    withMedia(docs).select(
      col("doc_id"),
      expr(s"""
        aggregate(
          sequence(1, greatest(octet_length(media) div $factor, 1)),
          CAST('' AS BINARY),
          (acc, i) -> concat(acc, substring(media, (i - 1) * $factor + 1, 1)))
      """).as("media_small"))

  /** Pluggable per-payload codec: the seam where a real decoder
    * (libjpeg / ffmpeg / tokenizer) plugs in. Implementations must be
    * serializable — they ship to executors.
    */
  trait MediaCodec extends Serializable {
    /** bytes → fixed-width feature vector (or None for undecodable). */
    def decode(payload: Array[Byte]): Option[Array[Float]]
    def dim: Int
  }

  /** Deterministic PNG fixture: an 8×8 RGB checkerboard whose two tone
    * values per channel are affine functions of `id` mod 256, encoded
    * through `javax.imageio` — a REAL compressed image payload, but
    * with decoded pixel statistics in closed form (mean = (a+b)/2,
    * population std = |a−b|/2, both exact in double arithmetic), so a
    * SQL oracle can verify the full decode path byte-for-byte.
    */
  def syntheticPng(id: Long, side: Int = 8): Array[Byte] = {
    val a = Array.tabulate(3)(c => ((id * (3 + 2 * c) + 11 + 17 * c) % 256).toInt)
    val b = Array.tabulate(3)(c => ((id * (7 + 4 * c) + 5 + 23 * c) % 256).toInt)
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val p = if ((x + y) % 2 == 0) a else b
        img.setRGB(x, y, (p(0) << 16) | (p(1) << 8) | p(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a REAL (deterministically generated) PNG payload per doc —
    * the image analog of [[withMedia]]'s text-bytes stand-in. Payloads
    * are produced executor-side per partition (no driver materialize).
    */
  def withPngMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticPng(id))))
      .toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("image/png").as("mime"),
        lit(8).as("width"), lit(8).as("height")))
  }

  /** Real image decode on the JDK's built-in codec (`javax.imageio`):
    * payload → BufferedImage → 8 features
    * `[width, height, meanR, meanG, meanB, stdR, stdG, stdB]`
    * (population std). Undecodable bytes → None, matching the
    * drop-on-failure contract of [[decodeBatches]].
    */
  final class PngCodec extends MediaCodec {
    val dim = 8
    override def decode(payload: Array[Byte]): Option[Array[Float]] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val n = (w * h).toDouble
        val sum = new Array[Double](3)
        val sq = new Array[Double](3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = ((rgb >> (16 - 8 * c)) & 0xff).toDouble
              sum(c) += v
              sq(c) += v * v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val f = new Array[Float](dim)
        f(0) = w.toFloat
        f(1) = h.toFloat
        var c = 0
        while (c < 3) {
          val m = sum(c) / n
          f(2 + c) = m.toFloat
          f(5 + c) = math.sqrt(math.max(0.0, sq(c) / n - m * m)).toFloat
          c += 1
        }
        Some(f)
      }
    }
  }

  /** Deterministic stand-in codec (no media libs in this container):
    * "decodes" a payload into byte-histogram-bucket features.
    */
  final class FakeCodec(val dim: Int = 8) extends MediaCodec {
    override def decode(payload: Array[Byte]): Option[Array[Float]] =
      if (payload.isEmpty) None
      else {
        val f = new Array[Float](dim)
        payload.foreach(b => f((b & 0xff) % dim) += 1f)
        Some(f.map(_ / payload.length))
      }
  }

  /** Batched decode over executor partitions — the Scala analog of the
    * `mapInPandas` batch-decode shape: one codec instance per
    * partition, rows streamed through it, undecodable payloads dropped
    * (with the same iterator-in/iterator-out contract a vectorized
    * Python UDF would have).
    */
  def decodeBatches(docs: DataFrame, codec: MediaCodec): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a frame that already carries a `media` payload column (e.g.
    // [[withPngMedia]]) is decoded as-is; bare docs get the text-bytes
    // stand-in payload
    (if (docs.columns.contains("media")) docs else withMedia(docs))
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).map(f => (id, f))
        }
      }
      .toDF("doc_id", "features")
  }

  /** Frame/segment sampling over the binary payload: every `stride`-th
    * `frameBytes`-sized slice, as (doc_id, frame_idx, frame) rows —
    * the explode shape a video/audio pipeline fans out to.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 16, stride: Int = 4): DataFrame =
    withMedia(docs)
      .select(col("doc_id"), col("media"),
        octet_length(col("media")).as("n_bytes"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(expr(s"(n_bytes - $frameBytes) div ${frameBytes * stride}")
              .cast("int"), lit(0))),
          i => substring(col("media"), i * (frameBytes * stride) + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
}
