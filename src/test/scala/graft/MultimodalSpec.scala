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

  test("stubDecode golden values") {
    // fixed payloads: empty, ASCII, binary-ish, and a video-typed one
    val (f1, w1, h1, n1) = MultimodalOps.stubDecode(Array.emptyByteArray, "image")
    assert((f1, w1, h1) == (1, 16 + 17 % 64, 16 + (17L / 64 % 64).toInt))
    val ab = "abc".getBytes("UTF-8")
    val (f2, w2, h2, n2) = MultimodalOps.stubDecode(ab, "audio")
    val ck = ab.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    assert((w2, h2) == (16 + math.abs(ck % 64).toInt, 16 + math.abs((ck / 64) % 64).toInt))
    assert(f2 == 1)
    val (f3, _, _, n3) = MultimodalOps.stubDecode(ab, "video")
    assert(f3 == 1 + ab.length % 16)
    assert(n2 >= 0.0 && n2 < 1.0 && n3 == n2, "norm is in [0,1) and type-independent")
    // determinism across calls
    assert(MultimodalOps.stubDecode(ab, "audio") == MultimodalOps.stubDecode(ab, "audio"))
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
      val payload = r.getString(1).getBytes("UTF-8")
      val mt = Seq("image", "audio", "video")((id % 3).toInt)
      val (frames, w, h, norm) = MultimodalOps.stubDecode(payload, mt)
      val expect = (mt, payload.length.toLong, frames, w, h,
        BigDecimal(norm).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(id) == expect, s"doc $id: ${got(id)} != $expect")
    }
  }
}
