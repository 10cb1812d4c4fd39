package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Kill-and-resume-from-checkpoint golden test: tail the on-disk binlog
  * segments as a Structured-Streaming file source, crash AFTER the lake
  * commit of an epoch but BEFORE its streaming checkpoint, restart, and
  * require (a) the replayed epoch is skipped by the idempotent guard and
  * (b) the final state matches the oracle fold exactly.
  */
class StreamingResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val cfg = GenConfig(numEvents = 8000L, numRepos = 25L, pathsPerRepo = 8L)
  val stateCols = Seq("repo", "path", "lsn", "commit", "lang", "content", "stargazers")

  test("stream apply with injected crash resumes exactly-once") {
    val dir = TestSpark.tmpDir("cdc-stream")
    val (logDir, tableDir, ckDir) = (s"$dir/log", s"$dir/table", s"$dir/ck")
    Pipeline.writeLogSegments(spark, cfg, logDir, segments = 6)

    // first run: crash after epoch 2's lake commit
    val crashed =
      try {
        Pipeline.runStream(spark, logDir, tableDir, ckDir, failAfterEpoch = Some(2L))
        false
      } catch { case _: StreamingQueryException => true }
    assert(crashed, "injected failure must surface")
    val table = new LakeTable(tableDir)
    val committedAtCrash = table.latest().get.epochId
    assert(committedAtCrash == 2L, s"epoch 2 must be committed before the crash, got $committedAtCrash")

    // resume: batch 2 is redelivered (checkpoint never advanced past it)
    // and must be skipped by the epoch guard; batches 3..5 then apply
    Pipeline.runStream(spark, logDir, tableDir, ckDir)
    assert(table.latest().get.epochId == 5L)

    val got = table.read(spark)
    val want = Oracle.fold(spark, ChangeLogGen.events(spark, cfg).drop("delivery"))
    assert(got.select(stateCols.map(col): _*).exceptAll(want.select(stateCols.map(col): _*)).count() == 0)
    assert(want.select(stateCols.map(col): _*).exceptAll(got.select(stateCols.map(col): _*)).count() == 0)

    // no epoch applied twice: snapshot versions strictly increase one per applied epoch
    // (6 segments - 0 duplicates = 6 snapshots)
    assert(table.latest().get.version == 6L)

    // the schema ramp (v1 -> v4 at 25/50/75%) crossed epoch AND crash
    // boundaries mid-stream: the delta groups must span multiple
    // physical eras, proving streaming evolution (not just batch)
    val eras = table.latest().get.groups.map(_.schemaVersion).toSet
    assert(eras.size >= 3, s"stream must span schema eras, got $eras")

    // the streaming path must answer every era probe from the
    // micro-batch's parquet footers (batch.inputFiles), never by an
    // extra column-pruned scan over the batch — the same elision
    // replaySegments gets (round-2 verdict #2)
    assert(Apply.scanProbes(tableDir) == 0L,
      s"streaming era probe fell back to ${Apply.scanProbes(tableDir)} batch scans")
  }

  test("crash BEFORE commit: restart applies the batch (no loss)") {
    val dir = TestSpark.tmpDir("cdc-stream3")
    val (logDir, tableDir, ckDir) = (s"$dir/log", s"$dir/table", s"$dir/ck")
    Pipeline.writeLogSegments(spark, cfg, logDir, segments = 5)
    val crashed =
      try {
        Pipeline.runStream(spark, logDir, tableDir, ckDir, failBeforeEpoch = Some(2L))
        false
      } catch { case _: StreamingQueryException => true }
    assert(crashed)
    val table = new LakeTable(tableDir)
    // epoch 2 was NOT committed before the crash
    assert(table.latest().get.epochId == 1L)
    // resume: epoch 2 redelivers and must be applied this time
    Pipeline.runStream(spark, logDir, tableDir, ckDir, failBeforeEpoch = Some(2L))
    assert(table.latest().get.epochId == 4L)
    val got = table.read(spark)
    val want = Oracle.fold(spark, ChangeLogGen.events(spark, cfg).drop("delivery"))
    assert(got.select(stateCols.map(col): _*).exceptAll(want.select(stateCols.map(col): _*)).count() == 0)
    assert(want.select(stateCols.map(col): _*).exceptAll(got.select(stateCols.map(col): _*)).count() == 0)
  }

  test("mid-stream compaction during streaming keeps state correct") {
    val dir = TestSpark.tmpDir("cdc-stream2")
    Pipeline.writeLogSegments(spark, cfg, s"$dir/log", segments = 5)
    Pipeline.runStream(spark, s"$dir/log", s"$dir/table", s"$dir/ck", compactEvery = 2)
    val table = new LakeTable(s"$dir/table")
    val got = table.read(spark)
    val want = Oracle.fold(spark, ChangeLogGen.events(spark, cfg).drop("delivery"))
    assert(got.select(stateCols.map(col): _*).exceptAll(want.select(stateCols.map(col): _*)).count() == 0)
    assert(want.select(stateCols.map(col): _*).exceptAll(got.select(stateCols.map(col): _*)).count() == 0)
  }
}
