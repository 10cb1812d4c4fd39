package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-epoch, per-partition lineage + metrics side table.
  *
  * Reference analogue: the reference logs per-write progress and match
  * distances as it goes (coverage/io/netcdf/DefaultWriter.py:231-233,
  * point/io/netcdf/symphonie/AbstractSYMPHONIEReader.py:67-74) and
  * times stages with a decorator (utils/timing.py:23-30); here those
  * become queryable rows: one per (epoch, key-bucket) with the LSN
  * range and row count that bucket applied, plus the global source LSN
  * range of the raw batch (from the apply pass's observe() metrics) and
  * the committed snapshot version — enough to trace any state row back
  * to its log range.
  *
  * Cost model: the per-bucket breakdown is a column-pruned scan (lsn +
  * bucket partition column) of the delta files the epoch just wrote —
  * O(applied keys), NOT a second pass over the raw batch.
  */
final class Audit(val dir: String) {

  // Lineage jobs are side-channel writes over already-committed,
  // immutable delta files — they run on a single background thread so
  // the apply loop's next epoch overlaps them (Spark schedules
  // concurrent jobs fine). `flush()` joins before the caller declares
  // the replay complete.
  private val worker = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-audit"); t.setDaemon(true); t
  })
  private val pending = new java.util.concurrent.atomic.AtomicReference[Throwable](null)

  def recordAsync(
      spark: SparkSession,
      table: LakeTable,
      group: Option[FileGroup],
      rawStats: Map[String, Any],
      stats: ApplyStats): Unit = {
    val snap = table.latest() // resolve the snapshot NOW, not at run time
    worker.submit(new Runnable {
      def run(): Unit =
        try record(spark, table.root, snap, group, rawStats, stats)
        catch { case t: Throwable => pending.compareAndSet(null, t) }
    })
    ()
  }

  /** Wait for queued lineage writes; rethrows the first failure. */
  def flush(): Unit = {
    val latch = new java.util.concurrent.CountDownLatch(1)
    worker.submit(new Runnable { def run(): Unit = latch.countDown() })
    latch.await()
    Option(pending.get()).foreach(t => throw t)
  }

  def record(
      spark: SparkSession,
      table: LakeTable,
      group: Option[FileGroup],
      rawStats: Map[String, Any],
      stats: ApplyStats): Unit =
    record(spark, table.root, table.latest(), group, rawStats, stats)

  private def record(
      spark: SparkSession,
      tableRoot: String,
      snap: Option[Snapshot],
      group: Option[FileGroup],
      rawStats: Map[String, Any],
      stats: ApplyStats): Unit = {
    val snapshotVersion = snap.map(_.version).getOrElse(-1L)
    def stat(k: String): Long =
      rawStats.get(k).collect { case l: Long => l }.getOrElse(-1L)
    // only the group THIS epoch appended: an empty epoch (commit with no
    // files) must not re-record the previous group's rows under its id
    group.foreach { g =>
      spark.read.parquet(s"$tableRoot/${g.dir}")
        .groupBy(col("bucket"))
        .agg(
          min(col("lsn")).as("min_lsn"),
          max(col("lsn")).as("max_lsn"),
          count(lit(1)).as("rows_applied"))
        .withColumn("epoch_id", lit(stats.epochId))
        .withColumn("source_min_lsn", lit(stat("min_lsn")))
        .withColumn("source_max_lsn", lit(stat("max_lsn")))
        .withColumn("source_rows", lit(stat("rows_in_batch")))
        .withColumn("late_events", lit(stat("late_events")))
        .withColumn("snapshot_version", lit(snapshotVersion))
        .withColumn("schema_version", lit(stats.batchSchemaVersion))
        .withColumn("wall_ms", lit(stats.wallMs))
        // one file per epoch IS the minimal append (O(buckets) rows);
        // the file-count growth over a long replay is bounded by
        // compactAsync below, not by fanning the append out
        .coalesce(1)
        .write.mode("append").parquet(dir)
    }
  }

  /** Opportunistic audit-side compaction (the expireSnapshots analogue
    * for the lineage table): when the audit dir has accumulated more
    * than `maxFiles` parquet files — a 10^5-epoch replay would
    * otherwise leave 10^5 tiny files — rewrite the current files into
    * one and delete them. Runs on the same single worker thread as the
    * appends, so it never races a recordAsync; readers hold the
    * single-writer contract the lake's vacuum already states.
    * Trigger it alongside table compaction (Pipeline does). */
  def compactAsync(spark: SparkSession, maxFiles: Int = 64): Unit = {
    worker.submit(new Runnable {
      def run(): Unit =
        try compactNow(spark, maxFiles)
        catch { case t: Throwable => pending.compareAndSet(null, t) }
    })
    ()
  }

  private def compactNow(spark: SparkSession, maxFiles: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return
    val files = scala.util.Using.resource(java.nio.file.Files.list(root)) { st =>
      st.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    }
    if (files.size <= maxFiles) return
    val tmp = s"$dir-compact-tmp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    // read exactly the snapshot of files taken above (not the dir — a
    // concurrent append queued behind this job must not be absorbed
    // then deleted); mergeSchema spans engine versions, as in read()
    spark.read.option("mergeSchema", "true").parquet(files: _*)
      .coalesce(1).write.parquet(tmp)
    val moved = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp))) { st =>
      st.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
    }
    moved.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.move(f,
        root.resolve(s"compacted-${System.nanoTime()}-$i.parquet"))
    }
    files.foreach(f => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  // mergeSchema: an audit dir may span engine versions that added
  // metric columns (e.g. late_events); a single-footer schema would
  // read such a dir nondeterministically
  def read(spark: SparkSession): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}
