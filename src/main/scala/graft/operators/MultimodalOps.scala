package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary`
  * columns with typed metadata. The image/audio codec libraries are not
  * in this container, so the decode kernel is a clearly-marked
  * deterministic STUB — but the Spark-side plumbing (schema, batched
  * per-partition processing, partitioning, metadata extraction) is real
  * and tested. In PySpark this stage is `mapInPandas` with an
  * arrow-batched UDF; the Scala-native equivalent used here is a typed
  * `mapPartitions` over a case-class Dataset (same batch-per-partition
  * execution shape).
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeature(
      doc_id: Long, media_type: String, n_bytes: Long, n_frames: Int,
      width: Int, height: Int, feature_norm: Double)

  /** STUB decode: a real build links an image/audio codec here. The
    * fake is deterministic in the payload bytes so tests are stable. */
  def stubDecode(payload: Array[Byte], mediaType: String): (Int, Int, Int, Double) = {
    // ??? <- real codec goes here; deterministic fake below
    val n = payload.length
    val checksum = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    val width = 16 + math.abs(checksum % 64).toInt
    val height = 16 + math.abs((checksum / 64) % 64).toInt
    val frames = if (mediaType == "video") 1 + (n % 16) else 1
    val norm = math.abs((checksum % 100000) / 100000.0)
    (frames, width, height, norm)
  }

  /** Batched per-partition feature extraction over binary payloads. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (frames, w, h, norm) = stubDecode(r.payload, r.media_type)
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

    // the stubbed decode/feature pipeline over the typed binary Dataset
    // (rows-only driver check; MultimodalSpec pins the stub's golden
    // values and checks the distributed pipeline row-for-row against a
    // driver-side recomputation)
    "q35_multimodal_features" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("media_type"))
        .as[MediaRow]
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
