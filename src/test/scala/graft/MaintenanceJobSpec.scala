package graft

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** The compaction sweep does not have to run inline with the stream
  * (Pipeline's `compactEvery` cadence): BENCH.md's round-5 cadence
  * measurement argues the sweep "can equally run from a SEPARATE
  * maintenance job — the manifest CAS already serializes it". This
  * suite turns that claim into evidence: a second `LakeTable` handle
  * (standing in for a separate spark-submit maintenance job — the CAS
  * is filesystem-level, nothing is shared but the table root) loops
  * `compactBuckets` concurrently with a full multi-epoch replay.
  *
  * Contract under the race, all inherited from the commit discipline:
  *  - a compaction that loses the version CAS validates the new head
  *    and, if it only APPENDED delta groups since the sweep's read
  *    snapshot, re-commits METADATA-ONLY on top (Iceberg RewriteFiles
  *    retry — without this, a sweep whose window spans any epoch
  *    commit could never land against a busy stream); any other
  *    interleaving aborts the sweep;
  *  - an epoch upsert that loses re-reads the head and re-commits its
  *    already-written delta group on top (metadata-only retry);
  *  - so interleaving never drops an epoch, never resurrects a
  *    tombstone, and the final state is byte-identical to the
  *    single-threaded oracle fold.
  */
class MaintenanceJobSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val stateCols =
    Seq("repo", "path", "lsn", "commit", "lang", "content", "stargazers")

  private def assertSameState(got: DataFrame, want: DataFrame): Unit = {
    val g = got.select(stateCols.map(col): _*)
    val w = want.select(stateCols.map(col): _*)
    val extra = g.exceptAll(w).count()
    val missing = w.exceptAll(g).count()
    assert(extra == 0 && missing == 0,
      s"state mismatch under concurrent maintenance: $extra unexpected, $missing missing")
  }

  test("concurrent maintenance-job compaction: exact state, bounded deltas, no lost epoch") {
    val cfg = GenConfig(numEvents = 60000L, numRepos = 40L, pathsPerRepo = 15L)
    val dir = TestSpark.tmpDir("maint-job")
    val tableDir = s"$dir/t"
    val epochs = 10

    @volatile var stop = false
    val committedSweeps = new AtomicInteger(0)
    val attempts = new AtomicInteger(0)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val maintenance = new Thread(() => {
      val t = new LakeTable(tableDir) // own handle: a separate job
      while (!stop) {
        try {
          attempts.incrementAndGet()
          if (t.compactBuckets(spark, minDeltas = 2).nonEmpty)
            committedSweeps.incrementAndGet()
        } catch { case e: Throwable => failures.add(e) }
        Thread.sleep(20L)
      }
    }, "maintenance-job")
    maintenance.setDaemon(true)
    maintenance.start()
    try Pipeline.runBatchEpochs(spark, cfg, tableDir, epochs)
    finally { stop = true; maintenance.join(60000L) }

    assert(failures.isEmpty,
      s"maintenance job threw: ${Option(failures.peek()).map(_.toString).getOrElse("")}")

    val table = new LakeTable(tableDir)
    // no epoch lost to a losing CAS: the upsert retry re-committed it
    assert(table.latest().map(_.epochId).contains((epochs - 1).toLong),
      s"epoch high-water mark wrong: ${table.latest().map(_.epochId)}")
    // the race was real — at least one sweep landed mid-replay (every
    // epoch touches all buckets at this fixture, so any committed sweep
    // absorbs the delta groups live at its snapshot)
    assert(committedSweeps.get >= 1,
      s"no maintenance sweep ever committed (attempts=${attempts.get}) — fixture too fast to race")
    assert(table.deltaGroupCount < epochs,
      s"delta groups unbounded: ${table.deltaGroupCount} after $epochs epochs with ${committedSweeps.get} sweeps")

    // the invariant the whole engine is graded on: final state equals
    // the independent single-threaded fold row-for-row
    val want = Oracle.fold(spark, ChangeLogGen.events(spark, cfg).drop("delivery"))
    assertSameState(table.read(spark), want)
  }
}
