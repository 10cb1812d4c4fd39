package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** The spark-submit CLI (`graft.Submit`): each operational job drives
  * the same engine surface the specs already verify — this suite pins
  * the dispatch, the flag grammar, and an end-to-end tail→compact→
  * vacuum sequence through the CLI layer only.
  */
class SubmitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tail drains staged segments exactly-once; compact and vacuum run after") {
    val base = TestSpark.tmpDir("submit")
    val cfg = GenConfig(numEvents = 20000L, numRepos = 40L, pathsPerRepo = 15L)
    Pipeline.writeLogSegments(spark, cfg, s"$base/log", segments = 3)

    Submit.run(spark, Array("tail", s"$base/log", s"$base/t", s"$base/ckpt",
      "--audit", s"$base/audit", "--compact-every", "2"))
    val table = new LakeTable(s"$base/t")
    val want = Oracle.fold(spark, ChangeLogGen.events(spark, cfg).drop("delivery"))
    assert(table.read(spark).count() == want.count())
    assert(Oracle.digest(table.read(spark),
        Seq("repo", "path", "lsn", "content")) ==
      Oracle.digest(want, Seq("repo", "path", "lsn", "content")))

    // a rerun resumes from the checkpoint: nothing new to drain, no
    // duplicate application (same digest, same epoch high-water mark)
    val epochBefore = table.latest().get.epochId
    Submit.run(spark, Array("tail", s"$base/log", s"$base/t", s"$base/ckpt"))
    assert(table.latest().get.epochId == epochBefore)

    Submit.run(spark, Array("compact", s"$base/t", "1"))
    assert(table.deltaGroupCount == 0)
    Submit.run(spark, Array("vacuum", s"$base/t", "1", "0"))
    assert(Oracle.digest(table.read(spark),
        Seq("repo", "path", "lsn", "content")) ==
      Oracle.digest(want, Seq("repo", "path", "lsn", "content")))
  }

  test("flag grammar: bare switch, valued flag, junk rejected") {
    intercept[IllegalArgumentException](Submit.run(spark, Array.empty[String]))
    intercept[IllegalArgumentException](Submit.run(spark, Array("nonsense")))
    intercept[IllegalArgumentException](
      Submit.run(spark, Array("tail", "a", "b", "c", "stray-positional")))
    intercept[IllegalArgumentException](
      Submit.run(spark, Array("compact", "t", "2", "extra")))
  }
}
