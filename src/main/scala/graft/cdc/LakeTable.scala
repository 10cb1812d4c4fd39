package graft.cdc

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._
import scala.util.Using
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A file group within a snapshot: parquet files written under one
  * physical payload-schema era. Per-group schema ids emulate Iceberg's
  * per-file schema tracking so WIDEN (int->long) across eras never
  * relies on parquet `mergeSchema` (which cannot widen).
  * `excludedBuckets`: bucket partitions of this group superseded by a
  * later per-bucket compaction — readers skip them (partition pruning),
  * the files themselves are never rewritten. */
final case class FileGroup(dir: String, schemaVersion: Int, kind: String, // kind: base | delta
    excludedBuckets: Set[Int] = Set.empty)

/** One committed table snapshot (manifest). Versions are monotonically
  * increasing; the manifest with the highest version is current.
  * `epochId` implements the idempotent exactly-once commit: an upsert
  * whose epoch id is <= the committed high-water mark is a no-op replay.
  */
final case class Snapshot(
    version: Long,
    epochId: Long,
    schemaVersion: Int,
    groups: Seq[FileGroup],
    totalDeltaGroups: Int,
    // high-water mark of applied event LSNs — lets the next epoch count
    // late arrivals (events at or below it) without scanning the table
    maxLsn: Long = -1L,
    // the table's bucket-partition count, persisted like Iceberg's
    // bucket transform: readers/writers constructed with a different
    // default must still hash keys into the buckets the data was
    // actually written with, or point lookups prune to the wrong dir
    numBuckets: Int = 32,
    // per-writer commit watermarks for NON-default writers (the
    // Flink/Iceberg multi-writer idempotence shape): epoch ids are
    // monotone PER WRITER, not globally — a DLQ replay job committing
    // "its epoch 0" between two streaming micro-batches must neither
    // be skipped (its id compared against the stream's high-water
    // mark) nor advance the stream's mark (silently dropping the next
    // micro-batch, whose batchId would now be <= the mark). The
    // default writer (the stream / segment replay) keeps using
    // `epochId` above, so legacy manifests read unchanged.
    writerEpochs: Map[String, Long] = Map.empty) {
  /** The idempotence watermark `writer` commits against. */
  def watermark(writer: String): Long =
    if (writer == LakeTable.DefaultWriter) epochId
    else writerEpochs.getOrElse(writer, -1L)
}

/** Result of a chunked incremental read ([[LakeTable.readChangesChunked]]):
  * `changes` = union of every readable sub-range's per-epoch delta rows;
  * `ranges` = the (since, to] version sub-ranges actually served;
  * `resyncVersions` = versions whose commit was a compaction (rewrite)
  * that split the feed. CONTRACT: this table's compactions are
  * state-preserving rewrites that append no logical changes, so the
  * union is the complete change set of the whole range; a consumer that
  * cannot assume rewrites are state-preserving should reconcile at each
  * resync version (e.g. against `readVersion`) before trusting the next
  * chunk — the "resync at the boundary" contract. */
final case class ChunkedChanges(
    changes: DataFrame, ranges: Seq[(Long, Long)], resyncVersions: Seq[Long])

/** Thrown when another writer committed a snapshot version first (the
  * manifest CAS lost). upsert retries internally; compactions abort. */
final class CommitConflictException(version: Long)
  extends RuntimeException(s"snapshot v$version was committed concurrently")

/** Result of an upsert: whether the epoch committed (false = idempotent
  * replay skip) and the file group it appended (None for an empty
  * epoch that only advanced the high-water mark). Auditing MUST use
  * `group` rather than "the last group of the snapshot" — an empty
  * epoch's snapshot still ends with the previous epoch's group. */
final case class CommitResult(committed: Boolean, group: Option[FileGroup])

/** Self-managed snapshot/manifest lake table with MERGE-upsert semantics
  * (merge-on-read + background compaction), built because no Iceberg
  * runtime jar ships in /opt/spark/jars (SURVEY.md §7.2 fallback: same
  * commit/merge semantics, swappable for Iceberg `writeTo`/MERGE INTO on
  * a real cluster).
  *
  * Layout:
  *   root/manifests/v<00000000N>.json     (atomic-rename committed)
  *   root/data/<uuid>/bucket=NNN/ (parquet files)
  *
  * Scale design:
  *  - Data files are hash-bucketed on the key `(repo, path)` into
  *    `numBuckets` directories — the analogue of Iceberg bucket
  *    partitioning; per-bucket merge is the unit of parallel work and a
  *    storage-partitioned join on a real cluster.
  *  - Upserts append reduced per-key delta groups (merge-on-read, like
  *    Iceberg v2 delete files: tombstones ride along as op='D' rows);
  *    no per-batch rewrite of the base — the batch-size-independent hot
  *    path the 10^10-event design point requires.
  *  - Reads/compaction reconstruct last-writer-wins per key with a
  *    single hash-aggregate (`max_by(struct(...), lsn)`), which Spark
  *    executes with map-side partial aggregation — hot-repo skew
  *    collapses before the shuffle.
  *  - Reference analogue: the reference writes each rank's slab at
  *    disjoint global offsets into a shared file, idempotent by position
  *    (coverage/io/netcdf/DefaultWriter.py:41,230-240); here position =
  *    key bucket, idempotence = epoch-keyed snapshot commit.
  */
object LakeTable {
  /** One warning per JVM when a mount forces the no-CAS commit path. */
  private val linkFallbackWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Opt-in for the DEGRADED commit path on filesystems without hard
    * links (some FUSE/object-store mounts, exFAT): existence-probe +
    * atomic rename is atomic-publish but NOT compare-and-swap, so two
    * concurrent writers can both pass the probe and the second rename
    * silently replaces the first's committed snapshot — a lost update.
    * Default is therefore to FAIL the commit on such mounts; a
    * known-single-writer deployment sets `-Dgraft.lake.allowNoCas=true`
    * (or env GRAFT_LAKE_ALLOW_NOCAS=1) to accept the degradation. */
  private[graft] def noCasAllowed: Boolean =
    sys.props.get("graft.lake.allowNoCas").exists(_.equalsIgnoreCase("true")) ||
      sys.env.get("GRAFT_LAKE_ALLOW_NOCAS").contains("1")

  /** Test seam: the atomic link(target, source) primitive the commit
    * CAS uses — overridden in specs to simulate a link-less mount. */
  private[graft] var linkImpl: (Path, Path) => Unit =
    (target, src) => { Files.createLink(target, src); () }
  /** Test seam: named crash points on the write/commit/maintenance
    * path. A spec arms ONE name to throw, simulating a process kill at
    * exactly that stage boundary (CrashSweepSpec drives every point and
    * asserts resume reaches the oracle state). Production default is a
    * no-op — one megamorphic-free function call per commit. Points:
    * `upsert.after-write` (data group durable, nothing referenced),
    * `commit.after-tmp` (manifest tmp durable, not published),
    * `commit.after-publish` (published; HEAD hint + tmp cleanup lost),
    * `compact.after-write` / `rebucket.after-write` (rewritten group
    * durable, old manifest still current),
    * `vacuum.after-manifest-expire` (old manifests gone, orphan data
    * sweep not yet run). */
  private[graft] var failpoint: String => Unit = _ => ()
  /** The writer id whose watermark is the manifest's top-level epochId
    * (the stream / segment replay — every pre-existing caller). */
  val DefaultWriter = "default"

  /** Proxy keys for deterministic one-bucket-per-partition placement:
    * entry p is an integer whose Spark hash-partition id over `parts`
    * partitions is exactly p (same Murmur3+pmod the planner's
    * HashPartitioning.partitionIdExpression uses). `repartition(parts,
    * element_at(proxy, bucket%parts + 1))` then lands bucket b in
    * partition b%parts — the range partitioner's placement without its
    * boundary-sampling pass. Expected search cost is parts·H(parts)
    * hash evaluations, done once per distinct `parts` per JVM. */
  private val proxyCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private[cdc] def partitionProxy(parts: Int): Array[Long] =
    proxyCache.computeIfAbsent(parts, _ => {
      import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
      val out = new Array[Long](parts)
      val found = new Array[Boolean](parts)
      var remaining = parts
      var v = 0L
      while (remaining > 0) {
        val p = Pmod(new Murmur3Hash(Seq(Literal(v))), Literal(parts))
          .eval().asInstanceOf[Int]
        if (!found(p)) { found(p) = true; out(p) = v; remaining -= 1 }
        v += 1L
      }
      out
    })
}

final class LakeTable(val root: String, val numBuckets: Int = 32) {
  private val mapper = new ObjectMapper()
  private def manifestDir = Paths.get(root, "manifests")
  private def dataDir = Paths.get(root, "data")
  private def headPath = manifestDir.resolve("HEAD")

  def init(): Unit = {
    Files.createDirectories(manifestDir)
    Files.createDirectories(dataDir)
  }

  // ---- manifest I/O -------------------------------------------------

  private def manifestPath(version: Long): Path =
    manifestDir.resolve(f"v$version%09d.json")

  // Every Files.list/walk stream is closed via Using.resource: each
  // holds a directory fd, and a long replay (the 10^10-event design
  // point is many thousands of epochs, each calling latest()) would
  // otherwise exhaust file descriptors (EMFILE).
  private def versions(): Seq[Long] = {
    if (!Files.isDirectory(manifestDir)) return Nil
    Using.resource(Files.list(manifestDir)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        // digits-only guard: a stray near-miss file (editor backup,
        // sync-conflict copy like "v000000001 (copy).json") must be
        // skipped, not brick every manifest-listing API with a
        // NumberFormatException
        .collect { case s if s.startsWith("v") && s.endsWith(".json") &&
            s.stripPrefix("v").stripSuffix(".json").forall(_.isDigit) &&
            s.length > "v.json".length =>
          s.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq.sorted
    }
  }

  private def hasParquet(dir: Path): Boolean =
    Using.resource(Files.walk(dir)) { st =>
      st.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
    }

  /** Best-effort head-pointer write (a HINT: `latest()` probes forward
    * from it, so a stale, torn or lost HEAD costs extra probes, never
    * correctness — which is why a plain replacing rename is enough here
    * where the manifest publish itself needs a CAS). */
  private def writeHead(version: Long): Unit =
    try {
      val tmp = manifestDir.resolve(s".head-tmp-${UUID.randomUUID()}")
      Files.write(tmp, version.toString.getBytes("UTF-8"))
      Files.move(tmp, headPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Exception => () }

  /** Current snapshot in O(1) directory operations: read the HEAD hint
    * and probe forward past any commits that raced the hint update —
    * O(1 + hint lag), independent of retained-manifest count. Without
    * the hint, `applyEpoch` calls here at least twice per epoch and an
    * unvacuumed 10^5-epoch replay paid an O(retained manifests)
    * directory listing each call (O(epochs^2) entries scanned overall).
    * Falls back to the full listing when HEAD is absent (legacy table,
    * first commit) or points at an expired manifest. */
  def latest(): Option[Snapshot] = {
    val hinted: Option[Long] =
      try {
        if (!Files.exists(headPath)) None
        else {
          val v = new String(Files.readAllBytes(headPath), "UTF-8").trim.toLong
          if (!Files.exists(manifestPath(v))) None // expired hint
          else {
            var cur = v
            while (Files.exists(manifestPath(cur + 1))) cur += 1
            Some(cur)
          }
        }
      } catch { case _: Exception => None }
    hinted.orElse(versions().lastOption).map(readManifest)
  }

  /** Time travel: the snapshot committed as version `v` (like Iceberg's
    * VERSION AS OF). O(1) existence probe, not a directory listing —
    * readChangesChunked calls this once per version in its range. */
  def snapshotAt(v: Long): Option[Snapshot] =
    if (v > 0 && Files.exists(manifestPath(v))) Some(readManifest(v)) else None

  private def readManifest(version: Long): Snapshot = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(version)))
    val groups = node.get("groups").elements().asScala.map { g =>
      val excluded =
        if (g.has("excludedBuckets"))
          g.get("excludedBuckets").elements().asScala.map(_.asInt()).toSet
        else Set.empty[Int]
      FileGroup(g.get("dir").asText(), g.get("schemaVersion").asInt(),
        g.get("kind").asText(), excluded)
    }.toSeq
    Snapshot(
      node.get("version").asLong(),
      node.get("epochId").asLong(),
      node.get("schemaVersion").asInt(),
      groups,
      groups.count(_.kind == "delta"),
      if (node.has("maxLsn")) node.get("maxLsn").asLong() else -1L,
      // legacy manifests (pre-persistence) trust the constructor default
      if (node.has("numBuckets")) node.get("numBuckets").asInt() else numBuckets,
      if (!node.has("writerEpochs")) Map.empty
      else {
        val we = node.get("writerEpochs")
        we.fieldNames().asScala.map(n => n -> we.get(n).asLong()).toMap
      })
  }

  /** Atomically commit a snapshot manifest: write tmp (fsync'd), then
    * PUBLISH via hard link — `link(2)` fails with EEXIST if the version
    * already exists, so exactly one of two racing committers wins (a
    * rename would silently REPLACE on POSIX and lose a snapshot; this
    * is the compare-and-swap Iceberg's metadata commit does against the
    * catalog). A crash before the link leaves only unreferenced tmp/data
    * files, never a partially visible snapshot. The manifest directory
    * is fsync'd after publishing so the commit survives power loss. */
  private def commitManifest(s: Snapshot): Unit = {
    val obj: ObjectNode = mapper.createObjectNode()
    obj.put("version", s.version)
    obj.put("epochId", s.epochId)
    obj.put("schemaVersion", s.schemaVersion)
    obj.put("maxLsn", s.maxLsn)
    obj.put("numBuckets", s.numBuckets)
    if (s.writerEpochs.nonEmpty) {
      val we = obj.putObject("writerEpochs")
      s.writerEpochs.toSeq.sortBy(_._1).foreach { case (w, e) => we.put(w, e) }
    }
    val arr: ArrayNode = obj.putArray("groups")
    s.groups.foreach { g =>
      val gn = arr.addObject()
      gn.put("dir", g.dir); gn.put("schemaVersion", g.schemaVersion); gn.put("kind", g.kind)
      if (g.excludedBuckets.nonEmpty) {
        val ex = gn.putArray("excludedBuckets")
        g.excludedBuckets.toSeq.sorted.foreach(ex.add)
      }
    }
    val tmp = manifestDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(obj))
    fsync(tmp)
    LakeTable.failpoint("commit.after-tmp")
    try LakeTable.linkImpl(manifestPath(s.version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new CommitConflictException(s.version)
      // a vacuum outside its grace window (or manual cleanup) swept our
      // tmp between write and publish: surface as a retryable conflict
      // — the retry writes a fresh tmp and links again
      case _: java.nio.file.NoSuchFileException =>
        throw new CommitConflictException(s.version)
      // filesystems without hard links (some FUSE/object-store mounts,
      // exFAT): existence-probe + atomic rename would be atomic-publish
      // but NOT compare-and-swap — two concurrent writers (exactly the
      // stream+compactor+vacuum triad Submit promotes) could both pass
      // the probe and the second rename silently replaces the first's
      // committed snapshot. FAIL the commit by default; the degradation
      // is OPT-IN for known-single-writer deployments (see noCasAllowed)
      case e: UnsupportedOperationException =>
        if (!LakeTable.noCasAllowed) {
          Files.deleteIfExists(tmp)
          throw new IllegalStateException(
            "manifest commit: this filesystem does not support hard links, " +
              "so the commit has no compare-and-swap primitive — refusing " +
              "to commit (concurrent writers would silently lose updates). " +
              "If, and only if, exactly ONE writer ever touches this table " +
              "root, opt into the degraded atomic-rename path with " +
              "-Dgraft.lake.allowNoCas=true or GRAFT_LAKE_ALLOW_NOCAS=1.", e)
        }
        if (!LakeTable.linkFallbackWarned.getAndSet(true))
          System.err.println(
            "[lake] WARN: filesystem does not support hard links; manifest " +
              "commit degrades to atomic-rename WITHOUT compare-and-swap — " +
              "do not run concurrent writers against this mount")
        if (Files.exists(manifestPath(s.version))) {
          Files.deleteIfExists(tmp)
          throw new CommitConflictException(s.version)
        }
        Files.move(tmp, manifestPath(s.version),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    LakeTable.failpoint("commit.after-publish")
    Files.deleteIfExists(tmp)
    fsync(manifestDir)
    writeHead(s.version)
  }

  /** Best-effort fsync of a file or directory (a directory fsync makes
    * the link durable on POSIX; not all filesystems allow it — ignore). */
  private def fsync(p: Path): Unit =
    try {
      Using.resource(java.nio.channels.FileChannel.open(
        p, java.nio.file.StandardOpenOption.READ))(_.force(true))
    } catch { case _: Exception => () }

  /** fsync every file and directory under `dir` — a manifest must not
    * be published before the data files it references are durable, or
    * a power loss leaves a durable snapshot pointing at torn/absent
    * parquet (worse than losing both together). O(bucket files) per
    * epoch; on a real cluster the object store's PUT gives the same
    * barrier. */
  private def fsyncTree(dir: Path): Unit =
    if (Files.isDirectory(dir)) {
      Using.resource(Files.walk(dir))(_.iterator().asScala.toSeq)
        .foreach(fsync)
    }

  // ---- columns ------------------------------------------------------

  /** The table's effective bucket count: the value persisted in the
    * manifest once the first commit exists (the Iceberg bucket-transform
    * analogue — a reader constructed with any default must hash into the
    * buckets the data was written with), else the constructor's.
    * NOT a pure accessor: resolves the head manifest (one HEAD read +
    * JSON parse) per call — hot loops should resolve a snapshot once
    * and read `numBuckets` from it, as upsert does. */
  def bucketCount: Int = latest().map(_.numBuckets).getOrElse(numBuckets)

  /** Hash bucket of the key — MUST match across writers and eras.
    * Same caveat as [[bucketCount]]: resolves the manifest per call. */
  def bucketCol: org.apache.spark.sql.Column = bucketColFor(bucketCount)

  /** Write `src` (already carrying a group's state columns) as one
    * bucketed parquet group; shared by the four group writers (epoch
    * upsert, full compact, rebucket, per-bucket compact). The dir name
    * is a FULL UUID: these dirs are written with mode(Overwrite), so a
    * truncated-prefix collision with a live referenced group would
    * silently destroy committed data.
    *
    * Partitioned one bucket value per write task via a DETERMINISTIC
    * proxy key (round-7, guide §2.4): bucket values are the known
    * integers 0..nb-1, so the range partitioner's boundary-sampling job
    * (and the MEMORY_AND_DISK persist of the whole normalized batch it
    * forced — the sampler re-runs its child otherwise, ~+20%/epoch
    * measured when unpersisted) buys nothing; [[LakeTable.partitionProxy]]
    * precomputes, per target partition, an integer whose murmur3 hash
    * lands there, so a plain hash repartition places bucket b exactly
    * in partition b%parts — no sampling pass, no cache, ONE pass over
    * the batch, same one-bucket-per-task/file layout (plain hash
    * repartition of the raw bucket value balls-in-bins idles ~1/e of
    * the write cores). Returns None for a file-less (empty) group,
    * which must never be referenced (unreadable schema). */
  private def writeBucketedGroup(src: DataFrame, cols: Seq[String], nb: Int,
      parts: Int, groupSchemaVersion: Int, kind: String): Option[FileGroup] = {
    val suffix = if (kind == "base") "-base" else ""
    val groupDir = s"data/${UUID.randomUUID().toString}$suffix"
    val proxy = element_at(
      lit(LakeTable.partitionProxy(parts)), (pmod(col("bucket"), lit(parts)) + 1).cast("int"))
    src.select((cols.map(col) :+ bucketColFor(nb)): _*)
      .repartition(parts, proxy)
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$root/$groupDir")
    fsyncTree(Paths.get(root, groupDir)) // data durable BEFORE the manifest
    if (hasParquet(Paths.get(root, groupDir)))
      Some(FileGroup(groupDir, groupSchemaVersion, kind))
    else None
  }

  private def bucketColFor(nb: Int) =
    pmod(xxhash64(col("repo"), col("path")), lit(nb.toLong)).as("bucket")

  private def stateCols(schemaVersion: Int): Seq[String] = {
    val payload = SchemaRegistry.physicalSchema(schemaVersion).fieldNames.toSeq
    Seq("repo", "path", "op", "lsn", "ts") ++ payload
  }

  // ---- upsert (merge-on-read) --------------------------------------

  /** Append one reduced, normalized batch as a delta file group and
    * commit snapshot `epochId`. The batch must be one row per key
    * (last-writer-wins already reduced, tombstones as op='D').
    * Returns committed=false iff the epoch was already committed
    * (idempotent replay after restart — the written files of the
    * aborted attempt stay unreferenced). */
  /** `batchMaxLsn` is by-name: it is only evaluated AFTER the data
    * write (callers read it from the write job's observe() metrics). */
  def upsert(batch: DataFrame, epochId: Long, batchSchemaVersion: Int,
      batchMaxLsn: => Long = -1L,
      writer: String = LakeTable.DefaultWriter): CommitResult = {
    init()
    val prev = latest()
    if (prev.exists(_.watermark(writer) >= epochId)) return CommitResult(committed = false, None)

    val cols = stateCols(batchSchemaVersion)
    // The delta-group write is re-runnable so a mid-flight bucket-count
    // change (an online rebucket committing while this epoch's files
    // were in flight) can REWRITE the batch under the new count and
    // keep going — the aborted attempt's files stay unreferenced
    // (vacuum candidates). An empty epoch still advances the commit
    // high-water mark (writeBucketedGroup returns None).
    def writeGroup(nbNow: Int): Option[FileGroup] =
      writeBucketedGroup(batch, cols, nbNow, nbNow, batchSchemaVersion, "delta")
    // bucket with the table's committed bucket count, not the instance
    // default — a writer opened with a different numBuckets must not
    // scatter keys across a second bucketing scheme
    var nb = prev.map(_.numBuckets).getOrElse(numBuckets)
    var written = writeGroup(nb)
    LakeTable.failpoint("upsert.after-write")
    val maxLsn = batchMaxLsn // evaluate the by-name once, after the write

    // optimistic commit: if another writer won the version CAS, re-read
    // the new head and re-commit THIS epoch's already-written group on
    // top of it (Iceberg's metadata-refresh retry) — data files are
    // immutable, only the manifest is rebuilt. If the winner already
    // committed this epoch id (a racing attempt of the same epoch),
    // the replay guard turns the retry into the idempotent no-op and
    // our files stay unreferenced (vacuum candidates).
    var base = prev
    while (true) {
      if (base.exists(_.watermark(writer) >= epochId)) return CommitResult(committed = false, None)
      val newSchemaVersion = math.max(base.map(_.schemaVersion).getOrElse(1), batchSchemaVersion)
      val groups = base.map(_.groups).getOrElse(Nil) ++ written.toSeq
      // a non-default writer advances ONLY its own watermark — the
      // top-level epochId stays the default writer's mark, so an
      // interleaved side-channel commit (DLQ replay) can never make the
      // stream's next batch id look already-applied
      val (newEpochId, newWriterEpochs) =
        if (writer == LakeTable.DefaultWriter)
          (epochId, base.map(_.writerEpochs).getOrElse(Map.empty[String, Long]))
        else
          (base.map(_.epochId).getOrElse(-1L),
            base.map(_.writerEpochs).getOrElse(Map.empty[String, Long]) + (writer -> epochId))
      try {
        commitManifest(Snapshot(
          base.map(_.version).getOrElse(0L) + 1L, newEpochId, newSchemaVersion, groups,
          groups.count(_.kind == "delta"),
          math.max(base.map(_.maxLsn).getOrElse(-1L), maxLsn), nb, newWriterEpochs))
        return CommitResult(committed = true, written)
      } catch {
        case _: CommitConflictException =>
          base = latest()
          // the table's bucketing changed under us (an online rebucket
          // committed mid-write, or a first-commit race between
          // different constructor defaults): our files cannot be
          // reconciled metadata-only — rewrite the batch under the
          // committed count and keep retrying. This keeps a streaming
          // writer ALIVE across a rebucket (the "online, no-downtime"
          // contract) at the cost of one extra pass over the keys-sized
          // reduced batch, on this rare race only.
          if (base.exists(_.numBuckets != nb)) {
            nb = base.get.numBuckets
            written = writeGroup(nb)
          }
      }
    }
    CommitResult(committed = false, None) // unreachable
  }

  // ---- read (merge-on-read reconstruction) -------------------------

  /** All live rows incl. tombstones, aligned to the current registry
    * schema. One scan per schema era, then unionByName. Bucket
    * restrictions (per-group compaction exclusions + the optional
    * caller filter) apply on the `bucket` PARTITION column, so they
    * prune directories at planning time — no data from a skipped
    * bucket is ever read. */
  private def rawRows(spark: SparkSession, snapshot: Option[Snapshot],
      onlyBuckets: Option[Set[Int]] = None): Option[DataFrame] = {
    snapshot.flatMap { s =>
      val dfs = s.groups.map { g =>
        val base = spark.read.parquet(s"$root/${g.dir}")
        val afterExcl =
          if (g.excludedBuckets.isEmpty) base
          else base.filter(!col("bucket").isin(g.excludedBuckets.toSeq: _*))
        val restricted = onlyBuckets match {
          case Some(bs) => afterExcl.filter(col("bucket").isin(bs.toSeq: _*))
          case None     => afterExcl
        }
        SchemaRegistry.alignToCurrent(restricted)
      }
      dfs.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
    }
  }

  /** Last-writer-wins reconstruction per key; deletes drop out. */
  def read(spark: SparkSession): DataFrame = readAt(spark, latest())

  /** Time-travel read: state as of committed snapshot `version`.
    * Fails loudly for an expired or never-committed version — an empty
    * frame would be indistinguishable from "the table was genuinely
    * empty at v" (same contract as readChanges). */
  def readVersion(spark: SparkSession, version: Long): DataFrame =
    readAt(spark, Some(snapshotAt(version).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot at version $version (expired or never committed)"))))

  /** O(one-bucket) point lookup of a single key: the key's bucket is
    * derived DRIVER-SIDE with the same xxhash64(seed=42) the writers
    * use, so the scan partition-prunes to `bucket=<b>` directories —
    * 1/numBuckets of the table's files regardless of table size (the
    * Iceberg bucket-transform point-read analogue; at 10^8 keys this is
    * the difference between a key-serving read and a table scan). */
  def readKey(spark: SparkSession, repo: String, path: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val snap = latest()
    // derive the bucket with the MANIFEST's bucket count: a reader
    // constructed with a different default would prune to the wrong
    // directory and silently miss existing rows
    val nb = snap.map(_.numBuckets).getOrElse(numBuckets)
    val h = XxHash64(Seq(Literal(repo), Literal(path)), 42L)
      .eval(null).asInstanceOf[Long]
    val b = (((h % nb) + nb) % nb).toInt
    readAt(spark, snap, onlyBuckets = Some(Set(b)))
      .filter(col("repo") === repo && col("path") === path)
  }

  private def readAt(spark: SparkSession, snapshot: Option[Snapshot],
      onlyBuckets: Option[Set[Int]] = None): DataFrame =
    reconstructAt(spark, snapshot, onlyBuckets)
      .filter(col("op") =!= "D")
      .drop("op")

  /** Per-key LWW winner rows WITH the winning `op` retained (op='D'
    * rows are the live tombstones). This is what COMPACTION must fold:
    * dropping a tombstone erases the delete's LSN, and a late
    * lower-LSN row landing in a later epoch (bounded disorder, a DLQ
    * replay, an out-of-order multi-writer epoch) would then win the
    * reconstruction and RESURRECT the deleted key — the round-6
    * EndToEndSpec caught exactly that. Visible reads filter the
    * tombstones at the end (readAt). */
  private def reconstructAt(spark: SparkSession, snapshot: Option[Snapshot],
      onlyBuckets: Option[Set[Int]] = None): DataFrame = {
    val payload = SchemaRegistry.currentPayloadNames
    val valueCols = Seq("op", "lsn", "ts") ++ payload
    rawRows(spark, snapshot, onlyBuckets) match {
      case None =>
        // same shape as the non-empty branch — a read must not change
        // schema with table emptiness
        val fields = Seq(
          StructField("repo", StringType), StructField("path", StringType),
          StructField("op", StringType), StructField("lsn", LongType),
          StructField("ts", TimestampType)) ++
          SchemaRegistry.fields.map(f => StructField(f.current.name, f.current.dataType))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
      case Some(df) =>
        df.groupBy(col("repo"), col("path"))
          .agg(max_by(struct(valueCols.map(col): _*), col("lsn")).as("s"))
          .select(col("repo") +: col("path") +: valueCols.map(c => col(s"s.$c").as(c)): _*)
    }
  }

  /** Incremental change read (the Iceberg incremental-scan analogue):
    * the reduced change rows (one row per key per epoch, op='D'
    * tombstones included) appended by snapshots in (sinceVersion,
    * toVersion], aligned to the current registry schema — a downstream
    * consumer can tail the TABLE as its own change source and chain
    * CDC stages. O(changed rows): reads only the delta groups those
    * snapshots appended, never the base.
    *
    * Fails if the range crosses a compaction (a rewrite replaces
    * groups, so per-epoch deltas are no longer reconstructible —
    * same contract as Iceberg's incremental read); callers then fall
    * back to a full `read`. */
  def readChanges(spark: SparkSession, sinceVersion: Long, toVersion: Long): DataFrame = {
    // sinceVersion = 0 means "from table creation"; any other missing
    // version (expired or never existed) must fail loudly — treating it
    // as 'beginning' would silently re-deliver the whole history
    val from =
      if (sinceVersion == 0L) Set.empty[String]
      else snapshotAt(sinceVersion).map(_.groups.map(_.dir).toSet).getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot at sinceVersion $sinceVersion (expired?); use 0 for from-start"))
    val to = snapshotAt(toVersion).getOrElse(
      throw new IllegalArgumentException(s"no snapshot at version $toVersion"))
    if (!from.subsetOf(to.groups.map(_.dir).toSet))
      throw new IllegalStateException(
        s"snapshot range ($sinceVersion, $toVersion] crosses a compaction; use read()")
    val appended = to.groups.filterNot(g => from.contains(g.dir))
    if (appended.exists(_.kind == "base"))
      throw new IllegalStateException(
        s"snapshot range ($sinceVersion, $toVersion] contains a compacted base; use read()")
    if (appended.exists(_.excludedBuckets.nonEmpty))
      throw new IllegalStateException(
        s"snapshot range ($sinceVersion, $toVersion] crosses a per-bucket compaction; use read()")
    val payload = SchemaRegistry.currentPayloadNames
    val cols = Seq("repo", "path", "op", "lsn", "ts") ++ payload
    appended
      .map(g => SchemaRegistry.alignToCurrent(spark.read.parquet(s"$root/${g.dir}")))
      .reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
      .map(_.select(cols.map(col): _*))
      .getOrElse(emptyChangeFrame(spark))
  }

  /** Empty frame with the change-feed schema (op + key + payload). */
  private def emptyChangeFrame(spark: SparkSession): DataFrame = {
    val fields = Seq(
      StructField("repo", StringType), StructField("path", StringType),
      StructField("op", StringType), StructField("lsn", LongType),
      StructField("ts", TimestampType)) ++
      SchemaRegistry.fields.map(f => StructField(f.current.name, f.current.dataType))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
  }

  /** Chunked fallback for a [[readChanges]] range that crosses
    * compactions: split (sinceVersion, toVersion] at every
    * non-append-only commit (full or per-bucket compaction) and union
    * the readable sub-ranges, so a consumer resumes an incremental
    * tail without falling back to a full table read. See
    * [[ChunkedChanges]] for the resync-at-the-boundary contract.
    * O(manifests in range) metadata + O(changed rows) data. */
  def readChangesChunked(spark: SparkSession, sinceVersion: Long,
      toVersion: Long): ChunkedChanges = {
    def snap(v: Long): Snapshot = snapshotAt(v).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot at version $v (expired?); use 0 for from-start"))
    val vs = versions().filter(v => v > sinceVersion && v <= toVersion).sorted
    var prev: Option[Snapshot] = if (sinceVersion == 0L) None else Some(snap(sinceVersion))
    val ranges = scala.collection.mutable.Buffer[(Long, Long)]()
    val resync = scala.collection.mutable.Buffer[Long]()
    var runStart = sinceVersion
    // sub-range endpoints must be RETAINED versions: after a vacuum the
    // version sequence has gaps, and closing a range at the arithmetic
    // v-1 (possibly expired) would make readChanges throw on a table
    // that is in the compaction+vacuum steady state this API exists
    // for. Track the last retained version seen instead; an expired
    // prefix (sinceVersion=0 on a vacuumed table whose oldest retained
    // snapshot holds a base) degrades to a leading resync boundary.
    var lastRetained = sinceVersion
    vs.foreach { v =>
      val cur = snap(v)
      val prevGroups = prev.map(_.groups).getOrElse(Nil)
      val curByDir = cur.groups.map(g => g.dir -> g).toMap
      // append-only = every prior group survives with identical bucket
      // exclusions and only plain delta groups were added; anything
      // else is a rewrite boundary
      val appendOnly =
        prevGroups.forall(g => curByDir.get(g.dir).exists(_.excludedBuckets == g.excludedBuckets)) &&
          cur.groups.filterNot(g => prevGroups.exists(_.dir == g.dir))
            .forall(g => g.kind == "delta" && g.excludedBuckets.isEmpty)
      if (!appendOnly) {
        if (lastRetained > runStart) ranges += ((runStart, lastRetained))
        resync += v
        runStart = v
      }
      lastRetained = v
      prev = Some(cur)
    }
    if (toVersion > runStart) ranges += ((runStart, toVersion))
    val changes = ranges.toSeq.map { case (a, b) => readChanges(spark, a, b) }
      .reduceOption(_.unionByName(_))
      // no readable sub-range: the empty frame with the change schema —
      // built directly (readChanges(to, to) would throw for toVersion=0,
      // i.e. a consumer polling a table with no committed snapshot yet)
      .getOrElse(emptyChangeFrame(spark))
    ChunkedChanges(changes, ranges.toSeq, resync.toSeq)
  }

  /** Rewrite all groups into a single compacted base group at the
    * current schema version, committed as a new snapshot with the same
    * epoch high-water mark. The per-batch hot path never pays this; it
    * runs when delta groups exceed a threshold (Pipeline) or
    * explicitly.
    *
    * TOMBSTONES ARE RETAINED (with their op='D' and LSN): dropping one
    * erases the delete's LSN, and a late lower-LSN event for the key
    * arriving in a later epoch (bounded disorder, DLQ replay, an
    * out-of-order multi-writer epoch) would resurrect the deleted key.
    * `purgeTombstonesBelowLsn` is the explicit retention knob (the
    * Kafka-compaction delete.retention / Iceberg delete-file-expiry
    * analogue): tombstones at or below it are physically dropped —
    * pass `snapshot.maxLsn - <your late-arrival bound>` once the
    * delivery contract guarantees nothing older can arrive. Default
    * Long.MinValue = purge nothing (always sound). */
  def compact(spark: SparkSession,
      purgeTombstonesBelowLsn: Long = Long.MinValue): Unit = {
    latest().foreach { s =>
      // the rewrite state is PINNED to s (reconstructAt, not read): a
      // delta committed between here and the commit below must appear
      // ONCE — as an appended group the validated retry stacks on top —
      // not also be absorbed into the base (duplicate rows at equal LSN)
      val state = reconstructAt(spark, Some(s))
        .filter(!(col("op") === "D" && col("lsn") <= purgeTombstonesBelowLsn))
      // compaction rewrites at the current registry schema regardless of
      // the eras the deltas were written under
      val cols = Seq("repo", "path", "op", "lsn", "ts") ++ SchemaRegistry.currentPayloadNames
      val newBase = writeBucketedGroup(state, cols, s.numBuckets, s.numBuckets,
        SchemaRegistry.maxVersion, "base").toSeq
      // validated commit retry — same RewriteFiles semantics as
      // compactBuckets: delta groups appended after `s` stack on top of
      // the new base (higher LSNs win); any other interleaving aborts
      var head = s
      var done = false
      while (!done) {
        val appended = head.groups.filterNot(h => s.groups.exists(_.dir == h.dir))
        val groups = appended ++ newBase
        try {
          commitManifest(Snapshot(
            head.version + 1L, head.epochId, head.schemaVersion, groups,
            groups.count(_.kind == "delta"), head.maxLsn, head.numBuckets,
            head.writerEpochs))
          done = true
        } catch {
          case _: CommitConflictException =>
            latest() match {
              case Some(h) if h.version > head.version && appendOnlySince(s, h) => head = h
              case _ => return
            }
        }
      }
    }
  }

  /** Online bucket-count migration — the Iceberg partition-spec
    * evolution analogue for the bucket transform. A bucket count is
    * chosen at table creation; at the 10^10-event design point the
    * right count GROWS with the table (point lookups and per-bucket
    * compaction both scan 1/numBuckets of the data), so a long-lived
    * table needs a way to change it without downtime. Rewrites the
    * current state into `newBuckets` buckets and commits a snapshot
    * carrying the new count; every subsequent writer, reader,
    * point-lookup and compaction derives its hashing from the manifest
    * (bucketCount), so the switch is atomic at the commit.
    *
    * Contracts, all inherited from the existing commit discipline:
    *  - CAS: a rebucket racing an epoch upsert loses and returns false
    *    (its state was computed against a superseded snapshot); the
    *    written files become vacuum candidates. Retry re-reads. In the
    *    other ordering — the rebucket commits while an epoch's files
    *    are in flight — the UPSERT's conflict retry detects the new
    *    bucket count and rewrites its batch under it, so a streaming
    *    writer stays alive across the migration (no downtime either
    *    way).
    *  - Time travel: pre-rebucket snapshots read exactly as before
    *    (readers never assume a global bucket count; only readKey
    *    derives one, from the manifest it reads).
    *  - Incremental reads: the commit is a base rewrite, so a range
    *    crossing it is refused by readChanges and surfaced as a
    *    resync boundary by readChangesChunked — same as compaction. */
  def rebucket(spark: SparkSession, newBuckets: Int): Boolean = {
    require(newBuckets > 0, s"rebucket: newBuckets must be positive, got $newBuckets")
    val s = latest().getOrElse(
      throw new IllegalStateException("rebucket: table has no committed snapshot"))
    if (s.numBuckets == newBuckets) return true
    // tombstones ride the migration (same soundness rule as compact:
    // a dropped tombstone + a late lower-LSN row = a resurrected key)
    val state = reconstructAt(spark, Some(s))
    val cols = Seq("repo", "path", "op", "lsn", "ts") ++ SchemaRegistry.currentPayloadNames
    val newBase = writeBucketedGroup(state, cols, newBuckets, newBuckets,
      SchemaRegistry.maxVersion, "base").toSeq
    LakeTable.failpoint("rebucket.after-write")
    try {
      commitManifest(Snapshot(
        s.version + 1L, s.epochId, s.schemaVersion, newBase, 0,
        s.maxLsn, newBuckets, s.writerEpochs))
      true
    } catch { case _: CommitConflictException => false }
  }

  /** Bucket partitions a group actually wrote (directory listing —
    * O(buckets) metadata, no file opens). */
  private def groupBuckets(dir: String): Set[Int] = {
    val p = Paths.get(root, dir)
    if (!Files.isDirectory(p)) return Set.empty
    Using.resource(Files.list(p)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.startsWith("bucket=") => s.stripPrefix("bucket=").toInt }
        .toSet
    }
  }

  /** Incremental (per-bucket) compaction — the Iceberg binpack analogue
    * the 10^10-event design point needs: rewrite ONLY buckets whose
    * live delta-group count reaches `minDeltas` into a new per-bucket
    * base group; every other bucket's files are untouched (their groups
    * stay referenced, with the compacted buckets excluded via partition
    * pruning). A full-table `compact` at that scale rewrites ~the whole
    * table to absorb a handful of hot buckets' deltas; this rewrites
    * O(hot-bucket data). Groups whose live buckets are all superseded
    * drop out of the manifest (their files become vacuum candidates for
    * expireSnapshots). Returns the compacted bucket ids (empty = no-op,
    * no new snapshot committed). */
  def compactBuckets(spark: SparkSession, minDeltas: Int,
      purgeTombstonesBelowLsn: Long = Long.MinValue): Set[Int] = {
    latest() match {
      case None => Set.empty
      case Some(s) =>
        val live: Seq[(FileGroup, Set[Int])] =
          s.groups.map(g => g -> (groupBuckets(g.dir) -- g.excludedBuckets))
        val deltaCounts = live.filter(_._1.kind == "delta")
          .flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
        val hot = deltaCounts.filter(_._2 >= minDeltas).keySet
        if (hot.isEmpty) return Set.empty

        // merged state of the hot buckets only: partition pruning keeps
        // the scan O(hot-bucket data); re-deriving bucketCol lands every
        // row back in its (hot) bucket. Tombstones are RETAINED (op='D'
        // + LSN) unless at/below the explicit purge horizon — see
        // compact()'s scaladoc for the late-arrival soundness argument.
        // NB: the horizon here reaches only the HOT buckets this sweep
        // rewrites; a RETENTION pass over tombstones already folded into
        // base groups (which never reach minDeltas) is compact()'s job —
        // the CLI's --purge-tombstones-below routes there.
        val state = reconstructAt(spark, Some(s), onlyBuckets = Some(hot))
          .filter(!(col("op") === "D" && col("lsn") <= purgeTombstonesBelowLsn))
        val cols = Seq("repo", "path", "op", "lsn", "ts") ++ SchemaRegistry.currentPayloadNames
        val newBase = writeBucketedGroup(state, cols, s.numBuckets,
          math.max(hot.size, 1), SchemaRegistry.maxVersion, "base").toSeq
        LakeTable.failpoint("compact.after-write")

        val kept = live.flatMap { case (g, liveBuckets) =>
          if ((liveBuckets -- hot).isEmpty) None // fully superseded
          else Some(g.copy(excludedBuckets = g.excludedBuckets ++ (hot & liveBuckets)))
        }

        // Commit with Iceberg-style VALIDATED RETRY (RewriteFiles
        // semantics) rather than abort-on-any-conflict: at the 10^10
        // design point a sweep takes minutes while epoch upserts commit
        // every few seconds, so a sweep whose read->commit window must
        // not span any upsert would never land. The rewrite stays valid
        // against a newer head iff the head only APPENDED delta groups
        // since `s` (no interleaved compaction/rebucket touched s's
        // groups): the new base is exactly state(s) for the hot buckets,
        // and deltas appended after s carry higher LSNs, so stacking
        // them on top of the base reconstructs the same LWW state. On
        // that condition the sweep re-commits METADATA-ONLY (data files
        // are immutable); otherwise it aborts and its files become
        // vacuum candidates.
        var head = s
        while (true) {
          val appended = head.groups.filterNot(h => s.groups.exists(_.dir == h.dir))
          val groups = kept ++ appended ++ newBase
          try {
            commitManifest(Snapshot(
              head.version + 1L, head.epochId, head.schemaVersion, groups,
              groups.count(_.kind == "delta"), head.maxLsn, head.numBuckets,
              head.writerEpochs))
            return hot
          } catch {
            case _: CommitConflictException =>
              val h = latest().getOrElse(return Set.empty)
              // no forward progress (a manifest file exists at a version
              // the head does not acknowledge — doctored or torn
              // metadata) or a non-append interleaving: abort
              if (h.version <= head.version || !appendOnlySince(s, h)) return Set.empty
              head = h
          }
        }
        hot // unreachable
    }
  }

  /** True iff `head` evolved from `s` by APPENDING delta groups only:
    * every group of `s` survives in `head` with identical kind and
    * exclusions, nothing but deltas was added, and the bucketing is
    * unchanged. This is the validity condition for re-committing a
    * compaction computed at `s` on top of `head` (see compactBuckets) —
    * a missing/re-excluded group means another compaction absorbed
    * rows the rewrite also holds (duplicate rows at equal LSN), and a
    * bucket-count change means appended deltas use a different
    * hashing; both are unreconcilable metadata-only. */
  private def appendOnlySince(s: Snapshot, head: Snapshot): Boolean =
    head.numBuckets == s.numBuckets &&
      s.groups.forall(g => head.groups.exists(h =>
        h.dir == g.dir && h.kind == g.kind && h.excludedBuckets == g.excludedBuckets)) &&
      head.groups.filterNot(h => s.groups.exists(_.dir == h.dir)).forall(_.kind == "delta")

  def deltaGroupCount: Int = latest().map(_.totalDeltaGroups).getOrElse(0)

  /** Expire old snapshots (vacuum): keep the newest `keep` manifests,
    * drop older ones, and delete data file groups no kept snapshot
    * references — the Iceberg expire_snapshots / remove_orphan_files
    * analogue. Time travel remains available for kept versions only.
    *
    * `graceMs` shields in-flight commits from the sweep (Iceberg's
    * older-than cutoff): an unreferenced group or tmp manifest whose
    * files were modified within the window is SPARED — a concurrent
    * writer may have written it and not yet published. Pass 0 only
    * when no writer can be active (tests, cold maintenance). */
  def expireSnapshots(keep: Int = 1, graceMs: Long = 600000L): Unit = {
    val cutoff = System.currentTimeMillis() - graceMs
    def olderThanGrace(p: Path): Boolean =
      try {
        Using.resource(Files.walk(p))(_.iterator().asScala.toSeq)
          .forall(f => Files.getLastModifiedTime(f).toMillis < cutoff)
      } catch { case _: Exception => false }
    // stale CAS leftovers (a crash between tmp-write and publish) —
    // only beyond the grace window, so a racing commit's freshly
    // written tmp is never swept from under its createLink
    if (Files.isDirectory(manifestDir)) {
      Using.resource(Files.list(manifestDir)) { st =>
        st.iterator().asScala.filter { p =>
          val n = p.getFileName.toString
          n.startsWith(".tmp-") || n.startsWith(".head-tmp-")
        }.toSeq
      }.filter(olderThanGrace).foreach(Files.deleteIfExists(_))
    }
    val vs = versions()
    if (vs.size <= keep) return
    val referenced = vs.takeRight(keep).flatMap(v => readManifest(v).groups.map(_.dir)).toSet
    vs.dropRight(keep).foreach(v => Files.deleteIfExists(manifestPath(v)))
    LakeTable.failpoint("vacuum.after-manifest-expire")
    if (Files.isDirectory(dataDir)) {
      val dirs = Using.resource(Files.list(dataDir))(_.iterator().asScala.toSeq)
      dirs.foreach { d =>
        if (!referenced.contains(s"data/${d.getFileName}") && olderThanGrace(d)) {
          Using.resource(Files.walk(d))(_.iterator().asScala.toSeq)
            .reverse.foreach(Files.deleteIfExists(_))
        }
      }
    }
  }
}
