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

  test("tail on an empty log dir: sniff fails fast naming --layout; explicit layout proceeds") {
    val dir = TestSpark.tmpDir("submit-empty")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/log"))
    // nothing to sniff -> guessing JSON would permanently break a typed
    // producer's scans; the tail must fail fast and name the remedy
    val ex = intercept[IllegalStateException] {
      Submit.run(spark, Array("tail", s"$dir/log", s"$dir/t", s"$dir/ck"))
    }
    assert(ex.getMessage.contains("--layout"), s"remedy not named: ${ex.getMessage}")
    // an explicit layout starts, drains the (empty) dir, exits cleanly
    Submit.run(spark, Array("tail", s"$dir/log", s"$dir/t", s"$dir/ck",
      "--layout", "json"))
    assert(new graft.cdc.LakeTable(s"$dir/t").latest().isEmpty,
      "no segments -> no commits")
  }
}
