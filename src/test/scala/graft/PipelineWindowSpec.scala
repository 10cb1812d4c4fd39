package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Pins the epoch-window/clamp coherence fixed in Pipeline.epochIdWindow:
  * withEpoch clamps every overflow delivery (span % epochs of them) into
  * the LAST epoch, so the last epoch's generation window must extend to
  * the full delivery span. A window that stopped at (e+1)*chunk silently
  * dropped the highest-id events whenever span % epochs exceeded the
  * 2W+6 window margin — the tail of the log vanished from both the batch
  * replay and the materialized segment binlog.
  *
  * The triggering shape needs span % epochs large relative to the
  * disorder window: small W, epochs that doesn't divide span.
  */
class PipelineWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // span = 2*1000 + 2*2 + 2 = 2006; epochs=67 -> chunk=29, 67*29=1943,
  // remainder 63 >> 2W+6 = 10: the old last-epoch window lost the tail.
  val cfg = GenConfig(numEvents = 1000L, numRepos = 20L, pathsPerRepo = 10L,
    dupEvery = 0L, disorderWindow = 2L)
  val epochs = 67

  val stateCols = Seq("repo", "path", "lsn", "commit", "lang", "content", "stargazers")

  test("per-epoch batches cover every delivered event (no lost tail)") {
    val stats = {
      val dir = TestSpark.tmpDir("pipe-window")
      Pipeline.runBatchEpochs(spark, cfg, s"$dir/t", epochs)
    }
    val physical = ChangeLogGen.physicalRows(cfg)
    assert(stats.map(_.inputRows).sum == physical,
      s"epoch batches must partition all $physical delivered events")
  }

  test("many-epoch replay reaches the same final state as one epoch") {
    val dirA = TestSpark.tmpDir("pipe-window-a")
    val dirB = TestSpark.tmpDir("pipe-window-b")
    Pipeline.runBatchEpochs(spark, cfg, s"$dirA/t", epochs)
    Pipeline.runBatchEpochs(spark, cfg, s"$dirB/t", 1)
    val a = Oracle.digest(new LakeTable(s"$dirA/t").read(spark), stateCols)
    val b = Oracle.digest(new LakeTable(s"$dirB/t").read(spark), stateCols)
    assert(a == b, "final table state must not depend on epoch chunking")
  }

  test("replaySegments with zero segments is a no-op, not a scan failure") {
    val dir = TestSpark.tmpDir("pipe-window-zero")
    assert(Pipeline.replaySegments(spark, s"$dir/log", s"$dir/t", 0).isEmpty)
  }

  test("materialized segments cover every delivered event, incl. max lsn") {
    val dir = TestSpark.tmpDir("pipe-window-seg")
    Pipeline.writeLogSegments(spark, cfg, s"$dir/log", segments = epochs)
    val seg = spark.read
      .schema(Pipeline.envelopeSchema)
      .parquet((0 until epochs).map(s => f"$dir/log/seg-$s%05d"): _*)
    assert(seg.count() == ChangeLogGen.physicalRows(cfg))
    val maxSeg = seg.agg(org.apache.spark.sql.functions.max("lsn")).collect()(0).getLong(0)
    val maxGen = ChangeLogGen.events(spark, cfg)
      .agg(org.apache.spark.sql.functions.max("lsn")).collect()(0).getLong(0)
    assert(maxSeg == maxGen, "segment binlog must retain the log tail")
  }
}
