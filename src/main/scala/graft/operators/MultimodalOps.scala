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
    * stable. A real build links ffmpeg-style codecs here. */
  def stubDecode(payload: Array[Byte], mediaType: String): (Int, Int, Int, Double) = {
    // ??? <- real audio/video codec goes here; deterministic fake below
    val n = payload.length
    val checksum = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    val width = 16 + math.abs(checksum % 64).toInt
    val height = 16 + math.abs((checksum / 64) % 64).toInt
    val frames = if (mediaType == "video") 1 + (n % 16) else 1
    val norm = math.abs((checksum % 100000) / 100000.0)
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
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, String)]
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

  val oracles: Map[String, String] = Map(
    "q34_multimodal_bytes" ->
      """SELECT doc_id, octet_length(payload) AS n_bytes,
         sha256(text) AS digest,
         CAST(ceil(octet_length(payload) / 4096.0) AS BIGINT) AS n_chunks
         FROM (SELECT doc_id, text, encode(text) AS payload FROM documents)"""
  )
}
