package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.cdc._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Systematic crash-point sweep over the write/commit/maintenance path.
  *
  * Each `LakeTable.failpoint` is armed in turn to throw — the
  * process-kill simulation at exactly that stage boundary — then the
  * replay RESUMES the way a restarted driver would (re-deliver the
  * interrupted epoch, continue to the end) and the final table state
  * must equal the uninterrupted oracle fold bit-for-bit. Afterwards
  * vacuum must reclaim every orphan the crash left behind
  * (unreferenced data groups, stale manifest tmps) without changing
  * visible state, and the surviving data directories must be exactly
  * the head snapshot's referenced groups.
  *
  * This exercises the exactly-once commit claim at EVERY stage
  * boundary, not just the two hand-picked crash sites the streaming
  * resume spec drives:
  *   - upsert.after-write        data group durable, nothing referenced
  *   - commit.after-tmp          manifest tmp durable, not published
  *   - commit.after-publish      published; HEAD hint + cleanup lost
  *   - compact.after-write       rewritten group durable, old head current
  *   - rebucket.after-write      ditto for the bucket migration
  *   - vacuum.after-manifest-expire  manifests expired, orphan sweep lost
  */
class CrashSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val cfg = GenConfig(numEvents = 4000L, numRepos = 40L, pathsPerRepo = 10L,
    disorderWindow = 16L)
  val epochs = 6
  val crashEpoch = 3
  val stateCols = Seq("repo", "path", "lsn", "commit", "lang", "content", "stargazers")

  private case class Injected(point: String)
    extends RuntimeException(s"injected crash at $point")

  private def arm(point: String): Unit =
    LakeTable.failpoint = name => if (name == point) throw Injected(point)
  private def disarm(): Unit = LakeTable.failpoint = _ => ()

  private def batches(): IndexedSeq[DataFrame] = {
    val all = Pipeline.withEpoch(ChangeLogGen.events(spark, cfg), cfg, epochs)
    (0 until epochs).map(e =>
      all.filter(col("epoch") === e.toLong).drop("delivery", "epoch"))
  }

  private lazy val oracleDigest: (Long, Long) = {
    val dir = TestSpark.tmpDir("crash-oracle")
    Pipeline.runBatchEpochs(spark, cfg, s"$dir/t", epochs)
    Oracle.digest(new LakeTable(s"$dir/t").read(spark), stateCols)
  }

  private def onDiskDataDirs(tableDir: String): Set[String] = {
    val p = Paths.get(tableDir, "data")
    if (!Files.isDirectory(p)) Set.empty
    else Using.resource(Files.list(p)) { st =>
      st.iterator().asScala.map(d => s"data/${d.getFileName}").toSet
    }
  }

  private def staleTmpManifests(tableDir: String): Seq[String] = {
    val p = Paths.get(tableDir, "manifests")
    if (!Files.isDirectory(p)) Nil
    else Using.resource(Files.list(p)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(".tmp-")).toSeq
    }
  }

  /** Vacuum with grace 0 (cold maintenance), then assert: state digest
    * unchanged, no stale tmp manifests, and the data directories on
    * disk are exactly the head snapshot's referenced groups. */
  private def assertVacuumReclaims(tableDir: String, t: LakeTable): Unit = {
    t.expireSnapshots(keep = 1, graceMs = 0L)
    assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
      "vacuum changed visible state")
    assert(staleTmpManifests(tableDir).isEmpty, "stale manifest tmp survived vacuum")
    val referenced = t.latest().get.groups.map(_.dir).toSet
    assert(onDiskDataDirs(tableDir) == referenced,
      s"crash debris survived vacuum: disk=${onDiskDataDirs(tableDir)} vs referenced=$referenced")
  }

  for (point <- Seq("upsert.after-write", "commit.after-tmp", "commit.after-publish"))
    test(s"crash at $point mid-replay: resume reaches the oracle state") {
      val dir = TestSpark.tmpDir(s"crash-${point.replace('.', '-')}")
      val t = new LakeTable(s"$dir/t")
      val bs = batches()
      (0 until crashEpoch).foreach(e => Apply.applyEpoch(spark, t, bs(e), e.toLong))
      arm(point)
      try intercept[Injected] {
        Apply.applyEpoch(spark, t, bs(crashEpoch), crashEpoch.toLong)
      } finally disarm()
      // resume: a restarted driver re-delivers the interrupted epoch and
      // continues — after-publish resumes into the idempotent-skip path,
      // the two earlier points re-apply the epoch for real
      (crashEpoch until epochs).foreach(e => Apply.applyEpoch(spark, t, bs(e), e.toLong))
      assert(t.latest().get.epochId == epochs - 1L, "resume did not reach the last epoch")
      assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
        s"state after crash at $point + resume diverged from the oracle")
      assertVacuumReclaims(s"$dir/t", t)
    }

  test("crash between quarantine write and commit: resume does not duplicate DLQ rows") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i)
    def json(i: Int) = s"""{"commit":"c$i","lang":"en","content":"body$i"}"""
    val base = TestSpark.tmpDir("crash-dlq")
    val t = new LakeTable(s"$base/table")
    val dlq = new DeadLetterQueue(s"$base/dlq")
    val env = Seq(
      ("U", 1L, ts(1), 1, "r1", "pA", null: String, json(1)),
      ("U", 2L, ts(2), 1, "r1", "pB", null: String, "{not json"),
      ("X", 3L, ts(3), 1, "r1", "pC", null: String, json(3)))
      .toDF("op", "lsn", "ts", "schemaVersion", "repo", "path", "before", "after")
    // the quarantine set lands BEFORE the delta write; a crash after
    // either leaves an uncommitted epoch whose resume re-runs the
    // quarantine as an overwrite of the same epoch directory
    arm("upsert.after-write")
    try intercept[Injected] {
      Apply.applyEpoch(spark, t, env, 0L, versionHint = Some(1), dlq = Some(dlq))
    } finally disarm()
    val st = Apply.applyEpoch(spark, t, env, 0L, versionHint = Some(1), dlq = Some(dlq))
    assert(st.committed)
    val q = dlq.read(spark).select("path", "lsn", "reason").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(q.toSeq.sorted == Seq(("pB", 2L, "malformed_payload"), ("pC", 3L, "unknown_op")),
      s"resume duplicated or lost quarantine rows: ${q.toSeq}")
    val state = t.read(spark).select("path").as[String].collect().toSeq
    assert(state == Seq("pA"), s"lake state wrong after DLQ crash resume: $state")
  }

  test("crash at compact.after-write: head state untouched, retry compacts, vacuum reclaims") {
    val dir = TestSpark.tmpDir("crash-compact")
    val t = new LakeTable(s"$dir/t")
    val bs = batches()
    (0 until epochs).foreach(e => Apply.applyEpoch(spark, t, bs(e), e.toLong))
    val headBefore = t.latest().get.version
    arm("compact.after-write")
    try intercept[Injected] { t.compactBuckets(spark, minDeltas = 2) }
    finally disarm()
    assert(t.latest().get.version == headBefore, "crashed compaction moved the head")
    assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
      "crashed compaction changed visible state")
    assert(t.compactBuckets(spark, minDeltas = 2).nonEmpty, "retry compaction was a no-op")
    assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
      "retried compaction changed visible state")
    assertVacuumReclaims(s"$dir/t", t)
  }

  test("crash at rebucket.after-write: bucketing untouched, retry migrates, vacuum reclaims") {
    val dir = TestSpark.tmpDir("crash-rebucket")
    val t = new LakeTable(s"$dir/t")
    val bs = batches()
    (0 until epochs).foreach(e => Apply.applyEpoch(spark, t, bs(e), e.toLong))
    arm("rebucket.after-write")
    try intercept[Injected] { t.rebucket(spark, newBuckets = 8) }
    finally disarm()
    assert(t.bucketCount == 32, "crashed rebucket changed the committed bucket count")
    assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
      "crashed rebucket changed visible state")
    assert(t.rebucket(spark, newBuckets = 8), "retry rebucket failed")
    assert(t.bucketCount == 8)
    assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
      "retried rebucket changed visible state")
    assertVacuumReclaims(s"$dir/t", t)
  }

  // The streaming variant drives the two tightest commit boundaries
  // through checkpoint recovery: after-tmp (epoch 2's manifest written
  // but never published — restart must RE-APPLY the redelivered batch)
  // and after-publish (epoch 2 committed but the HEAD hint, tmp cleanup
  // and checkpoint all lost — restart must SKIP it idempotently, with
  // latest() recovering by probing forward from the stale HEAD).
  for ((point, committedAtCrash) <- Seq("commit.after-tmp" -> 1L, "commit.after-publish" -> 2L))
    test(s"streaming: crash at $point in micro-batch 2 resumes exactly-once from checkpoint") {
      val dir = TestSpark.tmpDir(s"crash-stream-${point.replace('.', '-')}")
      val (logDir, tableDir, ckDir) = (s"$dir/log", s"$dir/table", s"$dir/ck")
      Pipeline.writeLogSegments(spark, cfg, logDir, segments = epochs)
      val hits = new java.util.concurrent.atomic.AtomicInteger()
      LakeTable.failpoint =
        name => if (name == point && hits.incrementAndGet() == 3) throw Injected(point)
      val crashed =
        try { Pipeline.runStream(spark, logDir, tableDir, ckDir); false }
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
        finally disarm()
      assert(crashed, "injected failure must surface through the streaming query")
      val t = new LakeTable(tableDir)
      assert(t.latest().get.epochId == committedAtCrash,
        s"commit visibility at the $point boundary is wrong: ${t.latest().get.epochId}")
      Pipeline.runStream(spark, logDir, tableDir, ckDir)
      assert(t.latest().get.epochId == epochs - 1L, "restart did not drain the log")
      assert(t.latest().get.version == epochs.toLong,
        s"an epoch committed twice across the restart: version ${t.latest().get.version}")
      assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
        s"stream state after crash at $point + restart diverged from the oracle")
    }

  test("crash at vacuum.after-manifest-expire: head intact, re-vacuum completes the sweep") {
    val dir = TestSpark.tmpDir("crash-vacuum")
    val t = new LakeTable(s"$dir/t")
    val bs = batches()
    (0 until epochs).foreach(e => Apply.applyEpoch(spark, t, bs(e), e.toLong))
    arm("vacuum.after-manifest-expire")
    try intercept[Injected] { t.expireSnapshots(keep = 1, graceMs = 0L) }
    finally disarm()
    // old manifests are gone but the head and its data survive; orphaned
    // groups from expired snapshots are still on disk awaiting the sweep
    assert(t.latest().get.epochId == epochs - 1L, "vacuum crash lost the head")
    assert(Oracle.digest(t.read(spark), stateCols) == oracleDigest,
      "interrupted vacuum changed visible state")
    assertVacuumReclaims(s"$dir/t", t)
  }
}
