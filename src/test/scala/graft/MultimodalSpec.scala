package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

/** Multimodal plumbing: the stub decode is deterministic in the payload
  * bytes (golden values pinned here — a codec swap that changes the
  * contract should fail loudly), and the distributed q35 pipeline must
  * agree row-for-row with a driver-side recomputation over the same
  * payloads.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("image decode is a real PNG codec round trip (golden-pinned)") {
    // hand-built 2x1 image: one black, one white pixel -> mean Rec.709
    // luminance exactly 0.5; a wrong-channel or wrong-count decode fails
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (f, w, h, norm) = MultimodalOps.decodeImage(bos.toByteArray)
    assert((f, w, h) == (1, 2, 1))
    assert(math.abs(norm - 0.5) < 1e-12, s"mean luminance $norm != 0.5")

    // synthetic payloads are REAL PNGs with id-determined dimensions
    val png7 = MultimodalOps.syntheticPng(7L)
    assert(png7.take(8).toSeq == Seq(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), "not a PNG signature")
    val (f7, w7, h7, n7) = MultimodalOps.decodeImage(png7)
    assert((f7, w7, h7) == (1, 3 + 7 % 6, 3 + (7 / 6) % 6))
    assert(n7 > 0.0 && n7 < 1.0)
    // encode->decode determinism across calls
    assert(MultimodalOps.decodeImage(MultimodalOps.syntheticPng(7L)) == (f7, w7, h7, n7))
    // an undecodable payload fails loudly, not silently
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeImage("not an image".getBytes("UTF-8"))
    }
  }

  test("stubDecode golden values (audio/video stub path)") {
    val ab = "abc".getBytes("UTF-8") // n=3, b0='a'=97, bl='c'=99
    val (f2, w2, h2, n2) = MultimodalOps.stubDecode(ab, "audio")
    // SQL-expressible contract: width/height/norm from (len, first byte,
    // last byte) only — the q35 oracle recomputes these in DuckDB
    assert((w2, h2) == (16 + ((3 * 31 + 97) % 64), 16 + ((3 * 17 + 99) % 64)))
    assert(f2 == 1)
    assert(n2 == ((3L * 131 + 97L * 31 + 99L * 7) % 100000L) / 100000.0)
    val (f3, _, _, n3) = MultimodalOps.stubDecode(ab, "video")
    assert(f3 == 1 + ab.length % 16)
    assert(n2 >= 0.0 && n2 < 1.0 && n3 == n2, "norm is in [0,1) and type-independent")
    // determinism across calls; empty payload well-defined
    assert(MultimodalOps.stubDecode(ab, "audio") == MultimodalOps.stubDecode(ab, "audio"))
    assert(MultimodalOps.stubDecode(Array.empty[Byte], "audio") == (1, 16, 16, 0.0))
  }

  test("q35 distributed features equal driver-side recomputation") {
    val got = SparkEntry.queries("q35_multimodal_features")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getDouble(6))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { r =>
      val id = r.getLong(0)
      val mt = Seq("image", "audio", "video")((id % 3).toInt)
      val payload =
        if (mt == "image") MultimodalOps.syntheticPng(id)
        else r.getString(1).getBytes("UTF-8")
      val (frames, w, h, norm) = MultimodalOps.decode(payload, mt)
      val expect = (mt, payload.length.toLong, frames, w, h,
        BigDecimal(norm).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(id) == expect, s"doc $id: ${got(id)} != $expect")
    }
    // the image rows really took the codec path: dimensions in the
    // synthetic 3..8 range, not the stub's 16..79
    assert(got.collect { case (id, v) if id % 3 == 0 => v._4 }
      .forall(w => w >= 3 && w <= 8))
  }
}
