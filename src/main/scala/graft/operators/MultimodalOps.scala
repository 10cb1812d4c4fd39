package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary`
  * columns with typed metadata, decoded/feature-extracted batch-wise
  * per partition. In PySpark this stage is `mapInPandas` with an
  * arrow-batched UDF; the Scala-native equivalent used here is a typed
  * `mapPartitions` over a case-class Dataset (same batch-per-partition
  * execution shape).
  *
  * The IMAGE path is a REAL codec round trip: payloads are genuine PNG
  * bytes and `decodeImage` decodes them with `javax.imageio` (PNG/JPEG/
  * BMP/GIF ship with the JDK — zero added dependencies). Audio/video
  * codecs are not in this container, so those two paths remain a
  * clearly-marked deterministic STUB behind the same interface.
  */
object MultimodalOps {

  // javax.imageio defaults to a temp-FILE-backed stream cache even for
  // in-memory byte-array streams — one temp file created and deleted per
  // encode/decode. Pure overhead for this path (round-7; q35 decodes
  // thousands of in-memory payloads per run).
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeature(
      doc_id: Long, media_type: String, n_bytes: Long, n_frames: Int,
      width: Int, height: Int, feature_norm: Double)

  /** Deterministic tiny PNG: a (3 + id%6) x (3 + id/6%6) RGB image
    * whose pixels are a pure hash of (id, x, y), encoded through the
    * JDK's real PNG writer — so the decode path below exercises a real
    * codec, not a fake. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 3 + java.lang.Math.floorMod(id, 6L).toInt
    val h = 3 + java.lang.Math.floorMod(id / 6L, 6L).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = id * 0x9E3779B97F4A7C15L + x * 131L + y * 92821L
        v ^= v >>> 33; v *= 0xFF51AFD7ED558CCDL; v ^= v >>> 29
        img.setRGB(x, y, (v & 0xFFFFFFL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode via javax.imageio: (frames=1, width, height,
    * mean Rec.709 luminance in [0,1]) from the decoded raster. */
  def decodeImage(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += (0.2126 * ((rgb >> 16) & 0xff) + 0.7152 * ((rgb >> 8) & 0xff) +
          0.0722 * (rgb & 0xff)) / 255.0
        x += 1
      }
      y += 1
    }
    (1, w, h, sum / (w.toLong * h))
  }

  /** STUB decode for media types whose codecs this container lacks
    * (audio/video): deterministic in the payload bytes so tests are
    * stable, and a function of (length, first byte, last byte) ONLY so
    * the driver's DuckDB oracle can recompute it in plain SQL over the
    * source text — that is what upgrades the q35 gate from rows-only
    * to an exact cross-engine match. A real build links ffmpeg-style
    * codecs here. */
  def stubDecode(payload: Array[Byte], mediaType: String): (Int, Int, Int, Double) = {
    // ??? <- real audio/video codec goes here; deterministic fake below
    val n = payload.length.toLong
    val b0 = if (n > 0) payload(0) & 0xff else 0
    val bl = if (n > 0) payload(payload.length - 1) & 0xff else 0
    val width = (16L + (n * 31L + b0) % 64L).toInt
    val height = (16L + (n * 17L + bl) % 64L).toInt
    val frames = if (mediaType == "video") (1L + n % 16L).toInt else 1
    val norm = ((n * 131L + b0 * 31L + bl * 7L) % 100000L) / 100000.0
    (frames, width, height, norm)
  }

  /** Codec dispatch: real imageio decode for images, stub otherwise. */
  def decode(payload: Array[Byte], mediaType: String): (Int, Int, Int, Double) =
    if (mediaType == "image") decodeImage(payload) else stubDecode(payload, mediaType)

  /** Batched per-partition feature extraction over binary payloads. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (frames, w, h, norm) = decode(r.payload, r.media_type)
        MediaFeature(r.doc_id, r.media_type, r.payload.length.toLong, frames, w, h, norm)
      }
    }
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary-column metadata path that IS cross-engine checkable:
    // synthesize the payload from text bytes, compute size / sha256 /
    // chunk count as Column algebra
    "q34_multimodal_bytes" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("text").as("text_copy"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("text_copy"), 256).as("digest"),
          ceil(octet_length(col("payload")).cast("double") / 4096.0).cast("long").as("n_chunks"))
    }),

    // the decode/feature pipeline over the typed binary Dataset: image
    // rows carry REAL PNG bytes decoded by javax.imageio; audio/video
    // rows go through the documented stub (rows-only driver check;
    // MultimodalSpec golden-pins the decoded dimensions/luminance and
    // checks the distributed pipeline row-for-row against a driver-side
    // recomputation)
    "q35_multimodal_features" -> ((s, dir) => {
      import s.implicits._
      // fanOut (round-7): the codec round trip is the cost and runs in
      // the scan stage — a single-split input would encode+decode every
      // payload on one core (no-op at scale)
      val media = graft.Graft.fanOut(
        s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val mt = Seq("image", "audio", "video")((id % 3).toInt)
          val payload =
            if (mt == "image") syntheticPng(id) else text.getBytes("UTF-8")
          MediaRow(id, payload, mt)
        }
      extractFeatures(media)
        .toDF()
        .withColumn("feature_norm", round(col("feature_norm"), 6))
    })
  )

  /** Upper doc_id covered by the q35 image ground-truth table (the
    * driver gates at sf<=0.1, whose documents table tops out below
    * this; larger corpora only run the query side, never this oracle). */
  val MaxTruthDocId = 4999L

  /** q35 image ground truth, computed from the pixel-hash FORMULA
    * directly — NOT by decoding the PNG — so the oracle checks the
    * engine's real imageio decode output against the generator's
    * intended pixels (a genuine codec verification). `n_bytes` is the
    * encoded payload length (a fixture property, so it does come from
    * the encoder). Luminance is summed row-major exactly as
    * [[decodeImage]] sums the decoded raster. */
  private def imageTruth(id: Long): (Long, Double) = {
    val w = 3 + java.lang.Math.floorMod(id, 6L).toInt
    val h = 3 + java.lang.Math.floorMod(id / 6L, 6L).toInt
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = id * 0x9E3779B97F4A7C15L + x * 131L + y * 92821L
        v ^= v >>> 33; v *= 0xFF51AFD7ED558CCDL; v ^= v >>> 29
        val rgb = (v & 0xFFFFFFL).toInt
        sum += (0.2126 * ((rgb >> 16) & 0xff) + 0.7152 * ((rgb >> 8) & 0xff) +
          0.0722 * (rgb & 0xff)) / 255.0
        x += 1
      }
      y += 1
    }
    (syntheticPng(id).length.toLong, sum / (w.toLong * h))
  }

  val oracles: Map[String, String] = Map(
    "q34_multimodal_bytes" ->
      """SELECT doc_id, octet_length(payload) AS n_bytes,
         sha256(text) AS digest,
         CAST(ceil(octet_length(payload) / 4096.0) AS BIGINT) AS n_chunks
         FROM (SELECT doc_id, text, encode(text) AS payload FROM documents)""",
    // image rows: decoded output vs the generator's ground truth
    // (VALUES table built from the pixel formula, round-5 verdict item
    // 2); audio/video rows: the SQL-expressible stub recomputed from
    // the source text (length + first/last byte — ASCII corpus)
    "q35_multimodal_features" -> {
      def d17(x: Double) = java.lang.String.format(
        java.util.Locale.ROOT, "%.17g", Double.box(x))
      val truthRows = (0L to MaxTruthDocId by 3L).map { id =>
        val (nb, lum) = imageTruth(id)
        val rounded = BigDecimal(lum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        s"($id,$nb,CAST(${d17(rounded)} AS DOUBLE))"
      }.mkString(",")
      s"""WITH truth(doc_id, tnb, fn) AS (VALUES $truthRows),
         img AS (
           SELECT d.doc_id, 'image' AS media_type,
             CAST(t.tnb AS BIGINT) AS n_bytes, CAST(1 AS INT) AS n_frames,
             CAST(3 + d.doc_id % 6 AS INT) AS width,
             CAST(3 + (d.doc_id // 6) % 6 AS INT) AS height,
             t.fn AS feature_norm
           FROM documents d JOIN truth t USING (doc_id)
           WHERE d.doc_id % 3 = 0),
         av AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE ascii(substr(text, 1, 1)) END AS b0,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE ascii(substr(text, length(text), 1)) END AS bl
           FROM documents WHERE doc_id % 3 <> 0)
         SELECT doc_id, media_type, n_bytes, n_frames, width, height,
                feature_norm
         FROM img
         UNION ALL
         SELECT doc_id, media_type, n AS n_bytes,
           CAST(CASE WHEN media_type = 'video' THEN 1 + n % 16 ELSE 1 END
                AS INT) AS n_frames,
           CAST(16 + (n*31 + b0) % 64 AS INT) AS width,
           CAST(16 + (n*17 + bl) % 64 AS INT) AS height,
           round(CAST((n*131 + b0*31 + bl*7) % 100000 AS DOUBLE)
                 / CAST(100000 AS DOUBLE), 6) AS feature_norm
         FROM av"""
    }
  )
}
