package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

final case class ApplyStats(
    epochId: Long,
    inputRows: Long,
    appliedKeys: Long,
    batchSchemaVersion: Int,
    committed: Boolean,
    wallMs: Long)

/** Key-skew controller for the apply reduce: observes each committed
  * epoch's rows-per-key ratio — rows_in_batch from the envelope
  * observation over the EXACT key count from a bare `count` observed
  * on the post-reduce frame (keys-sized, measured free; an earlier
  * design put approx_count_distinct in the pre-reduce CollectMetrics
  * and paid an interpreted xxhash+HLL per input row, a measured 35%
  * throughput tax) — and engages the two-stage salted reduce for the
  * NEXT epoch when the ratio crosses `threshold`. The steady-state CDC regime is O(10)
  * deliveries per key; an adversarial single-key flood drives the ratio
  * toward rows_in_batch, so the default threshold only ever trips on
  * genuine floods. Decision is one epoch behind by design — the
  * semantics are identical either way (max_by is associative/
  * commutative; CdcApplySpec proves salted ≡ unsalted), only the
  * shuffle shape changes, so a one-epoch lag costs one skewed shuffle,
  * never correctness. */
final class AdaptiveSalt(val threshold: Double = 256.0) {
  private val engagedFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var ratio: Double = -1.0
  /** Salt the next epoch? */
  def engaged: Boolean = engagedFlag.get()
  /** rows/distinct-keys of the last committed epoch (-1 before any). */
  def lastRatio: Double = ratio
  private[cdc] def update(rowsPerKey: Double): Unit = {
    ratio = rowsPerKey
    engagedFlag.set(rowsPerKey >= threshold)
  }
}

/** The per-epoch apply stage: raw delivered envelope rows -> dedup ->
  * per-key last-writer-wins reduction -> normalized payload -> lake
  * upsert + audit rows.
  *
  * Reference analogue: the reference's write loop sorts per-key series
  * by time, drops duplicate timestamps keep-first
  * (point/TimeMultiPoint.py:309-321) and then applies each value at its
  * key's fixed position (coverage/io/netcdf/DefaultWriter.py:230-240).
  * Here: dedup by LSN, reduce per (repo, path) with `max_by(..., lsn)`,
  * MERGE into the bucketed lake table.
  *
  * Scale notes (10^10-event design point):
  *  - the reduction is a hash aggregate with map-side partial
  *    aggregation — hot-repo keys (Zipf skew) collapse to one row per
  *    key per input partition BEFORE the shuffle, so the shuffle volume
  *    per epoch is O(distinct keys in batch), not O(events);
  *  - for adversarial single-key floods, `saltedReduce` pre-reduces on
  *    (key, salt) first — two smaller shuffles instead of one skewed
  *    one (north-rule salting; semantics-preserving because max_by is
  *    associative/commutative);
  *  - duplicates are exact redeliveries, so `max_by` tie-breaking on
  *    equal LSN is harmless (identical payloads); explicit
  *    dropDuplicates is therefore NOT needed on the hot path.
  */
object Apply {

  /** Per-table count of era probes answered by a full (column-pruned)
    * batch scan rather than a caller hint / footer statistics — the
    * 10^10-design "extra pass per epoch" this engine works to keep at
    * zero on both the replay and streaming paths. Keyed by table root
    * so concurrent pipelines observe their own counters (tests, ops). */
  private val scanProbeCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def scanProbes(tableRoot: String): Long =
    Option(scanProbeCounts.get(tableRoot)).map(_.longValue).getOrElse(0L)

  /** Normalize raw envelope rows (op, lsn, ts, schemaVersion, repo,
    * path, after) to era-physical payload columns at `version`.
    *
    * A STRING `after` is JSON, parsed exactly once into a struct column
    * in its own projection (see SchemaRegistry.parsePayload). A STRUCT
    * `after` (typed binlog segments — Pipeline.writeLogSegments with
    * typedPayload) is used directly: NO row ever JSON-parses, the
    * per-field projection is plain codegen'd GetStructField. */
  def normalize(events: DataFrame, version: Int): DataFrame = {
    val typed = events.schema("after").dataType.isInstanceOf[StructType]
    val parsed =
      if (typed) events.withColumn("_parsed", col("after"))
      else events.withColumn("_parsed", SchemaRegistry.parsePayload(col("after")))
    parsed.select(
      Seq(col("repo"), col("path"), col("op"), col("lsn"), col("ts")) ++
        SchemaRegistry.normalizedTo(version, col("_parsed")): _*)
  }

  /** One row per key: the event with the highest LSN wins; payload and
    * op ride along in the struct. */
  def reduce(events: DataFrame): DataFrame = {
    val valueCols = events.columns.filterNot(Seq("repo", "path").contains).toSeq
    events
      .groupBy(col("repo"), col("path"))
      .agg(max_by(struct(valueCols.map(col): _*), col("lsn")).as("s"))
      .select(col("repo") +: col("path") +: valueCols.map(c => col(s"s.$c").as(c)): _*)
  }

  /** Two-stage salted variant for adversarial key floods: pre-reduce on
    * (key, salt) — salt derived from lsn so it needs no extra column in
    * the data — then final-reduce per key. */
  def saltedReduce(events: DataFrame, saltBuckets: Int = 64): DataFrame = {
    val valueCols = events.columns.filterNot(Seq("repo", "path").contains).toSeq
    val salted = events
      .groupBy(col("repo"), col("path"), pmod(col("lsn"), lit(saltBuckets.toLong)).as("_salt"))
      .agg(max_by(struct(valueCols.map(col): _*), col("lsn")).as("s"))
      .select(col("repo") +: col("path") +: valueCols.map(c => col(s"s.$c").as(c)): _*)
    reduce(salted)
  }

  /** Apply one epoch of raw envelope events to `table`, exactly-once by
    * epoch id. Late events whose keys were already overwritten by a
    * higher LSN in an earlier epoch are neutralized by the merge-on-read
    * `max_by(lsn)` reconstruction, so no per-key lsn guard join is
    * needed at write time.
    *
    * Job structure per epoch (hot path = ONE full pass over the batch):
    *  1. max-version probe: `agg(max(schemaVersion))` — column-pruned to
    *     a single cheap envelope column (needed up front to pick the
    *     era-physical write schema);
    *  2. reduce -> normalize (JSON parse only on the one-row-per-key
    *     survivors) -> bucketed delta write, one pipeline with an
    *     `observe()` side-channel collecting the global source LSN
    *     range + row count at zero extra passes;
    *  3. per-bucket lineage: a column-pruned scan of the just-written
    *     delta files (lsn + bucket partition column only, ~keys rows)
    *     — records exactly what was applied where. */
  def applyEpoch(
      spark: SparkSession,
      table: LakeTable,
      rawEvents: DataFrame,
      epochId: Long,
      audit: Option[Audit] = None,
      salted: Boolean = false,
      versionHint: Option[Int] = None,
      adaptive: Option[AdaptiveSalt] = None,
      dlq: Option[DeadLetterQueue] = None,
      // idempotence namespace: epoch ids are monotone PER WRITER (see
      // Snapshot.writerEpochs) — side-channel committers (DLQ replay)
      // pass their own id so they never collide with the stream's
      // batch-id sequence
      writer: String = LakeTable.DefaultWriter): ApplyStats = {
    val t0 = System.nanoTime()

    def t() = System.nanoTime()
    val t1 = t()
    // era probe: prefer the caller-provided hint (parquet footer stats —
    // see ParquetStats.maxInt, zero data scanned); fall back to a
    // column-pruned scan for sources without footer metadata
    val batchVersion = versionHint.getOrElse {
      scanProbeCounts.merge(table.root, 1L, (a, b) => a + b)
      rawEvents.agg(coalesce(max(col("schemaVersion")), lit(1))).collect()(0).getInt(0)
    }
    val tProbe = t()

    // high-water mark BEFORE this batch: events at or below it arrived
    // after something newer was already applied — the late-arrival
    // count the reference logs as out-of-range/fallback diagnostics
    // (TimeMultiPoint.py:312-315); LWW neutralizes them, the metric
    // makes them visible
    val snap0 = table.latest()
    val prevMaxLsn = snap0.map(_.maxLsn).getOrElse(-1L)
    val obs = org.apache.spark.sql.Observation(s"graft-epoch-$epochId-${System.nanoTime()}")
    // per-row schemaVersion is dead weight past this point (the batch
    // normalizes at the scalar batchVersion) — drop it BEFORE the
    // reduce so it never rides the shuffle or the max_by struct buffer
    val baseMetrics = Seq(
      min(col("lsn")).as("min_lsn"),
      max(col("lsn")).as("max_lsn"),
      count(lit(1)).as("rows_in_batch"),
      sum(when(col("lsn") <= prevMaxLsn, 1L).otherwise(0L)).as("late_events"))
    val envelope = rawEvents
      .select("repo", "path", "op", "lsn", "ts", "after")
      .observe(obs, baseMetrics.head, baseMetrics.tail: _*)
    val useSalt = salted || adaptive.exists(_.engaged)
    val reducedAll = if (useSalt) saltedReduce(envelope) else reduce(envelope)
    // poison-pill quarantine (opt-in): classify POST-reduce — O(keys),
    // one extra cached scan; an already-committed epoch (idempotent
    // replay) skips both the quarantine write and the reduce job, same
    // fast path as without a DLQ
    val alreadyCommitted =
      dlq.isDefined && snap0.exists(_.watermark(writer) >= epochId)
    val (reduced, dlqCache) = dlq match {
      case Some(q) if !alreadyCommitted =>
        val typed = rawEvents.schema("after").dataType.isInstanceOf[StructType]
        val withReason = reducedAll.withColumn("_dlq_reason", q.reasonCol(typed))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // quarantine lands BEFORE the manifest commit: a crash replays
        // the epoch and overwrites the same deterministic set. Written
        // ONLY when poison exists — a clean 10^5-epoch stream must not
        // grow 10^5 empty epoch dirs (the existence probe is a LIMIT 1
        // on the already-persisted keys-sized frame)
        val bad = withReason.filter(col("_dlq_reason").isNotNull)
        if (bad.head(1).nonEmpty) q.write(epochId, bad, batchVersion)
        (withReason.filter(col("_dlq_reason").isNull).drop("_dlq_reason"), Some(withReason))
      case _ => (reducedAll, None)
    }
    // exact applied-key count as a second observation on the POST-reduce
    // frame — keys-sized, a bare count, so it is genuinely free. (The
    // previous skew signal, approx_count_distinct inside the pre-reduce
    // CollectMetrics, evaluated an interpreted xxhash+HLL per INPUT row
    // and measured a 35% throughput tax on the 16M-event fixture —
    // rows/exact-keys is both cheaper and exact.)
    val keysObs = org.apache.spark.sql.Observation(s"graft-keys-$epochId-${System.nanoTime()}")
    // the committed high-water mark must be the max APPLIED lsn: observe
    // it POST-quarantine (without a DLQ it equals the envelope max —
    // the per-key max_by keeps the global max; with one, a quarantined
    // poison event must NOT advance the mark, or late_events miscounts
    // and a tombstone purge at `maxLsn - bound` can run while the
    // never-applied row still waits in the DLQ). The envelope-level
    // max_lsn stays in the lineage record as the SOURCE range scanned.
    val normalized = normalize(reduced, batchVersion)
      .observe(keysObs, count(lit(1)).as("keys_in_batch"),
        max(col("lsn")).as("max_applied_lsn"))
    val commit =
      try table.upsert(normalized, epochId, batchVersion,
        batchMaxLsn =
          keysObs.get.get("max_applied_lsn").collect { case l: Long => l }.getOrElse(-1L),
        writer = writer)
      finally dlqCache.foreach(_.unpersist(blocking = false))
    val tUpsert = t()

    val inputRows =
      if (commit.committed) obs.get.get("rows_in_batch").map(_.asInstanceOf[Long]).getOrElse(0L)
      else 0L
    // obs.get BLOCKS until the observed action ran — an idempotent
    // replay skip returns from upsert before any action, so the
    // observations must only be consulted on a committed epoch
    val appliedKeys =
      if (commit.committed)
        keysObs.get.get("keys_in_batch").collect { case l: Long => l }.getOrElse(-1L)
      else -1L
    // feed the controller AFTER the epoch (decides the NEXT epoch's
    // reduce shape); uncommitted replays carry no new signal
    adaptive.foreach { a =>
      if (commit.committed && appliedKeys > 0) a.update(inputRows.toDouble / appliedKeys)
    }

    val wallMs = (System.nanoTime() - t0) / 1000000L
    val stats = ApplyStats(epochId, inputRows, appliedKeys, batchVersion, commit.committed, wallMs)
    if (commit.committed) audit.foreach(_.recordAsync(spark, table, commit.group, obs.get, stats))
    if (sys.env.contains("GRAFT_APPLY_TIMING"))
      System.err.println(f"[apply] epoch=$epochId probe=${(tProbe - t1) / 1e9}%.2fs " +
        f"upsert=${(tUpsert - tProbe) / 1e9}%.2fs audit=${(t() - tUpsert) / 1e9}%.2fs " +
        s"salted=$useSalt" +
        adaptive.map(a => f" ratio=${a.lastRatio}%.1f engagedNext=${a.engaged}").getOrElse(""))
    stats
  }

  /** Before-image lost-update audit — the consumer of the envelope's
    * `before` slot (Schema.scala). For each key's FIRST event in the
    * batch that carries a pre-image, compare the pre-image's content
    * sha256 against the CURRENT table state: a mismatch means the event
    * was captured against a state this table never served (a lost
    * update / out-of-band mutation between capture and apply). Returns
    * the flagged keys (repo, path, lsn, expected_sha, actual_sha).
    *
    * Only the batch's first event per key is checked (and only when it
    * carries a pre-image): later events' pre-images refer to intra-batch
    * predecessors, which the epoch apply collapses, and a key born
    * inside the batch has no state to compare against. Cost is O(batch
    * keys) — one agg + one key-equi join against state; a diagnostic
    * pass, not on the hot path.
    *
    * REQUIRES an in-order feed per key: with bounded disorder, a key's
    * first-in-batch event can carry the pre-image of an lsn-predecessor
    * that was displaced into a LATER epoch and is not applied yet, and
    * would be flagged spuriously. Run it on ordered feeds (or after a
    * disorder-absorbing dedup/sort stage), or treat flags as candidates
    * to re-check once the watermark passes. */
  def lostUpdateAudit(spark: SparkSession, table: LakeTable, rawEvents: DataFrame): DataFrame = {
    val first = rawEvents
      .groupBy(col("repo"), col("path"))
      .agg(min_by(struct(col("lsn"), col("before")), col("lsn")).as("_s"))
      .select(col("repo"), col("path"), col("_s.lsn").as("lsn"), col("_s.before").as("before"))
      .filter(col("before").isNotNull)
      .withColumn("_b",
        if (rawEvents.schema("before").dataType.isInstanceOf[StructType]) col("before")
        else SchemaRegistry.parsePayload(col("before")))
      // NUL sentinel so null content and "" content stay distinct
      // (the Oracle.digest convention)
      .select(col("repo"), col("path"), col("lsn"),
        sha2(coalesce(col("_b.content"), lit("\u0000")), 256).as("expected_sha"))
    val state = table.read(spark)
      .select(col("repo"), col("path"),
        sha2(coalesce(col("content"), lit("\u0000")), 256).as("actual_sha"))
    // left join: a pre-image for a key the table does not even have is
    // also a lost update (the captured row was deleted out-of-band)
    first.join(state, Seq("repo", "path"), "left")
      .filter(col("actual_sha").isNull || col("expected_sha") =!= col("actual_sha"))
  }
}
