package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.cdc.{Apply, ApplyStats, Audit, LakeTable, Pipeline}

/** Public API of the engine — the operators a user of the reference
  * library would reach for, re-expressed Spark-first, plus the CDC
  * ingest entry points. Everything is Column algebra / single-shuffle
  * DataFrame plans; nothing collects to the driver.
  *
  * {{{
  * import graft.Graft._
  * events.lastWriterWins(Seq("repo", "path"), col("lsn"))
  * orders.asofJoinLatest(quotes, "sym", "t", "px")
  * docs.minhashCandidatePairs("text", k = 16, bands = 4)
  * }}}
  */
object Graft {

  // ---- CDC engine entry points -------------------------------------

  /** Apply one exactly-once epoch of change events (envelope columns
    * op/lsn/ts/schemaVersion/repo/path/after) to the lake table at
    * `tableDir`. See graft.cdc.Apply for the job structure. */
  def applyChangeLog(spark: SparkSession, events: DataFrame, tableDir: String,
      epochId: Long, auditDir: Option[String] = None, salted: Boolean = false,
      dlqDir: Option[String] = None): ApplyStats =
    Apply.applyEpoch(spark, new LakeTable(tableDir), events, epochId,
      auditDir.map(new Audit(_)), salted,
      dlq = dlqDir.map(new graft.cdc.DeadLetterQueue(_)))

  /** Current state of a lake table (merge-on-read reconstruction). */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    new LakeTable(tableDir).read(spark)

  /** Point lookup of one key: partition-prunes to the key's single
    * hash bucket (1/numBuckets of the files at any table size). */
  def readTableKey(spark: SparkSession, tableDir: String,
      repo: String, path: String): DataFrame =
    new LakeTable(tableDir).readKey(spark, repo, path)

  /** Incremental change read: the reduced change rows (op/lsn/ts +
    * payload, tombstones included) committed in (sinceVersion,
    * toVersion] — tail the table itself as a change source and chain
    * CDC stages. O(changed rows); refuses ranges that cross a
    * compaction (Iceberg incremental-scan contract). */
  def readTableChanges(spark: SparkSession, tableDir: String,
      sinceVersion: Long, toVersion: Long): DataFrame =
    new LakeTable(tableDir).readChanges(spark, sinceVersion, toVersion)

  /** Chunked fallback when the range crosses a compaction: unions the
    * readable sub-ranges and names each rewrite boundary (resync-at-
    * the-boundary contract — see [[graft.cdc.ChunkedChanges]]). */
  def readTableChangesChunked(spark: SparkSession, tableDir: String,
      sinceVersion: Long, toVersion: Long): graft.cdc.ChunkedChanges =
    new LakeTable(tableDir).readChangesChunked(spark, sinceVersion, toVersion)

  /** Time-travel read: table state as of committed snapshot `version`
    * (Iceberg VERSION AS OF), reconstructed from manifest history. */
  def readTableVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame =
    new LakeTable(tableDir).readVersion(spark, version)

  /** Table maintenance: rewrite buckets holding >= `minDeltas` live
    * delta groups into per-bucket bases (Iceberg binpack analogue);
    * other buckets' files untouched. Returns the rewritten buckets. */
  def compactTable(spark: SparkSession, tableDir: String, minDeltas: Int): Set[Int] =
    new LakeTable(tableDir).compactBuckets(spark, minDeltas)

  /** Table maintenance: migrate the table to `newBuckets` hash buckets
    * (one state rewrite, atomic at the manifest commit; see
    * [[graft.cdc.LakeTable.rebucket]]). Returns false iff the commit
    * lost a CAS race — re-invoke to retry against the new snapshot. */
  def rebucketTable(spark: SparkSession, tableDir: String, newBuckets: Int): Boolean =
    new LakeTable(tableDir).rebucket(spark, newBuckets)

  /** Table maintenance: keep the newest `keep` snapshots, delete the
    * rest plus any data files no kept snapshot references (Iceberg
    * expire_snapshots + remove_orphan_files; single-writer vacuum). */
  def expireTableSnapshots(tableDir: String, keep: Int,
      graceMs: Long = 600000L): Unit =
    new LakeTable(tableDir).expireSnapshots(keep, graceMs)

  /** Requeue previously dead-lettered events after a fix (edited
    * quarantine rows or an evolved registry): re-classifies, applies
    * the now-clean rows as one fresh epoch, prunes drained quarantine
    * partitions. See [[graft.cdc.DeadLetterQueue.replay]]. */
  def replayDeadLetters(spark: SparkSession, dlqDir: String, tableDir: String,
      maxDriverRows: Long = graft.cdc.DeadLetterQueue.DefaultMaxDriverRows)
      : graft.cdc.DlqReplayStats =
    new graft.cdc.DeadLetterQueue(dlqDir).replay(spark, new LakeTable(tableDir),
      maxDriverRows)

  /** Tail a directory of binlog segments as a Structured Stream into
    * the lake table, checkpointed and exactly-once; resumes from
    * `checkpointDir` after a crash. */
  def streamChangeLog(spark: SparkSession, logDir: String, tableDir: String,
      checkpointDir: String, auditDir: Option[String] = None,
      // "sniff" | "json" | "typed": pin the segment payload layout when
      // the tail starts before its producer (empty dir = nothing to
      // sniff -> runStream fails fast and points here)
      layout: String = "sniff",
      // idempotence namespace — REQUIRED distinct per tail when more
      // than one ingest job feeds the same table (a shared namespace
      // silently drops the second tail's colliding batch ids)
      writer: String = graft.cdc.LakeTable.DefaultWriter): Unit =
    Pipeline.runStream(spark, logDir, tableDir, checkpointDir,
      auditDir.map(new Audit(_)), layout = layout, writer = writer)

  /** Scale-adaptive scan fan-out (guide §2.2/§2.5): CPU-dense per-row
    * stages (tokenize + hash families, regex scans, codec decodes)
    * inherit the SCAN's partitioning, and a small input (fewer splits
    * than cores) would run them almost serially. Repartition up to
    * `defaultParallelism` ONLY when the input has fewer partitions —
    * a no-op at any real scale (a 100-TB input always has more splits
    * than cores), so the shuffle this adds is bounded by the small-input
    * case where it is cheap by construction. With `keys`, hash-
    * partitions on them so a downstream groupBy on the same keys reuses
    * the exchange (guide §2.4); the explicit partition count keeps AQE
    * from coalescing the CPU-bound stage back down by its (tiny) byte
    * size. */
  private[graft] def fanOut(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.isEmpty) df.repartition(target)
    else df.repartition(target, keys: _*)
  }

  // ---- DataFrame operators ------------------------------------------

  implicit class GraftOps(private val df: DataFrame) {

    /** The union+window operators stage internal columns on the left
      * frame; a user column with one of those names would be silently
      * overwritten and returned corrupted (withColumn REPLACES). */
    private def requireFreeNames(op: String, names: String*): Unit = {
      val clash = df.columns.toSet & names.toSet
      require(clash.isEmpty,
        s"$op reserves internal column names; rename before calling: " +
          clash.toSeq.sorted.mkString(", "))
    }

    /** One row per key: the row with the greatest `orderCol` wins —
      * the CDC reduction (map-side partial agg collapses hot keys
      * before the shuffle). */
    def lastWriterWins(keyCols: Seq[String], orderCol: Column): DataFrame = {
      val valueCols = df.columns.filterNot(keyCols.contains).toSeq
      df.groupBy(keyCols.map(col): _*)
        .agg(max_by(struct(valueCols.map(col): _*), orderCol).as("_s"))
        .select(keyCols.map(col) ++ valueCols.map(c => col(s"_s.$c").as(c)): _*)
    }

    /** Keep-first dedup per key in `orderCols` order
      * (TimeMultiPoint.py:309-318 semantics). */
    def dedupKeepFirst(keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    }

    /** Per-group top-k by `orderCols`. */
    def topKPerGroup(keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k).drop("_rk")
    }

    /** As-of join: for each left row, the latest `right` row with the
      * same key and rightTs <= leftTs. Single shuffle (union + ordered
      * window), NO range product — the scale path for as-of joins.
      * Output: left columns + `asofValueCol` (null when no match;
      * ties on rightTs break by `rightTie` descending). */
    def asofJoinLatest(right: DataFrame, keyCol: String, leftTs: String,
        rightTs: String, rightValue: String,
        rightTie: Option[String] = None): DataFrame = {
      requireFreeNames("asofJoinLatest",
        "_k", "_t", "_v", "_tie", "_side", "_asof", s"asof_$rightValue")
      val leftCols = df.columns.toSeq
      val l = df.withColumn("_k", col(keyCol)).withColumn("_t", col(leftTs))
        .withColumn("_v", lit(null).cast(right.schema(rightValue).dataType))
        .withColumn("_tie", lit(Long.MaxValue))
        .withColumn("_side", lit(1))
      val r = right.select(
        col(keyCol).as("_k"), col(rightTs).as("_t"),
        col(rightValue).as("_v"),
        rightTie.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("_tie"),
        lit(0).as("_side"))
      val rPadded = leftCols.foldLeft(r)((acc, c) =>
        if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null).cast(df.schema(c).dataType)))
      val w = Window.partitionBy(col("_k"))
        .orderBy(col("_t"), col("_side"), col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      l.unionByName(rPadded, allowMissingColumns = true)
        .withColumn("_asof", last(col("_v"), ignoreNulls = true).over(w))
        .filter(col("_side") === 1)
        .select(leftCols.map(col) :+ col("_asof").as(s"asof_$rightValue"): _*)
    }

    /** Per-key LINEAR interpolation of `rightValue` AT each left row's
      * probe time — the reference's main resample menu item
      * (InterpolatorCore.py:87-130 method="linear" evaluated at the
      * fixed target axis of TimeCoverage.py:94-97): for every left
      * (probe) row, find the bracketing right rows (prev = latest
      * rightTs at-or-before leftTs, next = earliest rightTs strictly
      * after) and interpolate linearly between them; null outside the
      * brackets (probe before the first / after the last event), exact
      * value on an exact timestamp hit.
      *
      * Scale path: ONE shuffle — union both sides, one ordered window
      * per direction (the asofJoinLatest shape run both ways); never a
      * per-probe range join. `right` must be unique per (key, rightTs)
      * (pre-reduce duplicates, e.g. dedupKeepFirst). Output: left
      * columns + `interp_<rightValue>` (double). */
    def interpolateLinearAt(right: DataFrame, keyCol: String, leftTs: String,
        rightTs: String, rightValue: String): DataFrame = {
      requireFreeNames("interpolateLinearAt",
        "_k", "_t", "_v", "_side", "_pv", "_pt", "_nv", "_nt", s"interp_$rightValue")
      val leftCols = df.columns.toSeq
      def us(c: Column) = unix_micros(c.cast("timestamp")).cast("double")
      val l = df.withColumn("_k", col(keyCol))
        .withColumn("_t", col(leftTs).cast("timestamp"))
        .withColumn("_v", lit(null).cast("double"))
        .withColumn("_side", lit(1))
      val r = right.select(
        col(keyCol).as("_k"), col(rightTs).cast("timestamp").as("_t"),
        col(rightValue).cast("double").as("_v"), lit(0).as("_side"))
      val rPadded = leftCols.foldLeft(r)((acc, c) =>
        if (acc.columns.contains(c)) acc
        else acc.withColumn(c, lit(null).cast(df.schema(c).dataType)))
      // events sort BEFORE probes at equal time (side 0 < 1): an exact
      // hit lands in the prev bracket, and `next` is strictly later
      val wPrev = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val evT = when(col("_side") === 0, col("_t"))
      l.unionByName(rPadded, allowMissingColumns = true)
        .withColumn("_pv", last(col("_v"), ignoreNulls = true).over(wPrev))
        .withColumn("_pt", last(evT, ignoreNulls = true).over(wPrev))
        .withColumn("_nv", first(col("_v"), ignoreNulls = true).over(wNext))
        .withColumn("_nt", first(evT, ignoreNulls = true).over(wNext))
        .filter(col("_side") === 1)
        .withColumn(s"interp_$rightValue",
          when(us(col("_t")) === us(col("_pt")), col("_pv"))
            .otherwise(col("_pv") + (col("_nv") - col("_pv")) *
              (us(col("_t")) - us(col("_pt"))) / (us(col("_nt")) - us(col("_pt")))))
        .select(leftCols.map(col) :+ col(s"interp_$rightValue"): _*)
    }

    /** Per-key CUBIC interpolation of `rightValue` AT each left row's
      * probe time — the last item of the reference's interpolation menu
      * (InterpolatorCore.py:60-64, interp1d kind="cubic"), re-expressed
      * as a LOCAL cubic: a Hermite segment through the bracketing events
      * with three-point finite-difference tangents (the non-uniform
      * Catmull-Rom form). scipy's global not-a-knot spline needs a
      * tridiagonal solve over the whole per-key series — state that
      * cannot stream and a per-key O(n) memory hot spot at scale; the
      * local form uses exactly 4 control points per probe, matches the
      * spline away from boundaries to O(h^3), and is SQL-expressible, so
      * the gate is exact.
      *
      * Scale path: the 4 segment control points (prev, self, next,
      * next2) are attached to each EVENT row by one lag/lead window —
      * then one union + ONE carry window hands each probe its segment
      * struct; two shuffles total on the key, never a per-probe range
      * join. `right` must be unique per (key, rightTs). Outside the
      * event span the result is null; an exact timestamp hit returns the
      * event value. TANGENT CONVENTION at duplicate-free boundaries: a
      * segment missing its outer neighbor (the series' first/last
      * segment — so ALL segments of a 2- or 3-event series) uses the
      * ONE-SIDED difference (y1-y0)/h for that end's tangent; when both
      * tangents are one-sided (a 2-event series) the Hermite reduces
      * exactly to LINEAR interpolation between the bracketing events.
      * Output: left columns + `interp_<rightValue>` (double). */
    def interpolateCubicAt(right: DataFrame, keyCol: String, leftTs: String,
        rightTs: String, rightValue: String): DataFrame = {
      requireFreeNames("interpolateCubicAt",
        "_k", "_t", "_seg", "_side", "_sg", s"interp_$rightValue")
      val leftCols = df.columns.toSeq
      def us(c: Column) = unix_micros(c.cast("timestamp")).cast("double")
      val wEv = Window.partitionBy(col("_k")).orderBy(col("_t"))
      val ev = right.select(
        col(keyCol).as("_k"), col(rightTs).cast("timestamp").as("_t"),
        col(rightValue).cast("double").as("_v"))
        .select(col("_k"), col("_t"),
          struct(
            col("_t").as("t0"), col("_v").as("y0"),
            lag(col("_t"), 1).over(wEv).as("pmt"), lag(col("_v"), 1).over(wEv).as("pmv"),
            lead(col("_t"), 1).over(wEv).as("n1t"), lead(col("_v"), 1).over(wEv).as("n1v"),
            lead(col("_t"), 2).over(wEv).as("n2t"), lead(col("_v"), 2).over(wEv).as("n2v"))
            .as("_seg"),
          lit(0).as("_side"))
      val l = df.withColumn("_k", col(keyCol))
        .withColumn("_t", col(leftTs).cast("timestamp"))
        .withColumn("_seg", lit(null).cast(ev.schema("_seg").dataType))
        .withColumn("_side", lit(1))
      val rPadded = leftCols.foldLeft(ev)((acc, c) =>
        if (acc.columns.contains(c)) acc
        else acc.withColumn(c, lit(null).cast(df.schema(c).dataType)))
      // events sort BEFORE probes at equal time: an exact hit carries
      // its own segment (and returns y0 exactly)
      val wPrev = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def f(n: String) = col(s"_sg.$n")
      val h = us(f("n1t")) - us(f("t0"))
      val s = (us(col("_t")) - us(f("t0"))) / h
      val s2 = s * s
      val s3 = s * s * s
      val oneSided = (f("n1v") - f("y0")) / h
      val m0 = when(f("pmt").isNotNull,
        (f("n1v") - f("pmv")) / (us(f("n1t")) - us(f("pmt")))).otherwise(oneSided)
      val m1 = when(f("n2t").isNotNull,
        (f("n2v") - f("y0")) / (us(f("n2t")) - us(f("t0")))).otherwise(oneSided)
      val hermite = (lit(2) * s3 - lit(3) * s2 + lit(1)) * f("y0") +
        (s3 - lit(2) * s2 + s) * h * m0 +
        (lit(-2) * s3 + lit(3) * s2) * f("n1v") +
        (s3 - s2) * h * m1
      l.unionByName(rPadded, allowMissingColumns = true)
        .withColumn("_sg", last(col("_seg"), ignoreNulls = true).over(wPrev))
        .filter(col("_side") === 1)
        .withColumn(s"interp_$rightValue",
          when(col("_sg").isNull, lit(null).cast("double"))
            .when(us(col("_t")) === us(f("t0")), f("y0"))
            .when(f("n1t").isNull, lit(null).cast("double"))
            .otherwise(hermite))
        .select(leftCols.map(col) :+ col(s"interp_$rightValue"): _*)
    }

    /** Sessionize: a gap longer than `gap` starts a new session;
      * returns the input plus a per-key `session_id`. The gap string is
      * validated HERE (API boundary), not at plan analysis: a malformed
      * interval fails fast with the offending value named. */
    def sessionize(keyCol: String, tsCol: String, gap: String): DataFrame = {
      require(
        org.apache.spark.sql.catalyst.util.IntervalUtils.safeStringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(gap)) != null,
        s"sessionize gap '$gap' is not a valid interval (want e.g. '30 MINUTES')")
      val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("_prev", lag(col(tsCol), 1).over(byKey))
        .withColumn("_new",
          when(col("_prev").isNull || col(tsCol) > col("_prev") + expr(s"INTERVAL $gap"), 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("_new")).over(cum))
        .drop("_prev", "_new")
    }

    /** Per-key linear interpolation of `valueCol` at each row's time
      * from its ordered neighbors (InterpolatorCore.py:87-130 as
      * lag/lead Column arithmetic). Adds `interp_<valueCol>`. */
    def interpolateLinear(keyCol: String, tsCol: String, valueCol: String): DataFrame = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      def us(c: Column) = unix_micros(c.cast("timestamp")).cast("double")
      df.withColumn("_pv", lag(col(valueCol), 1).over(w))
        .withColumn("_nv", lead(col(valueCol), 1).over(w))
        .withColumn("_pt", lag(col(tsCol), 1).over(w))
        .withColumn("_nt", lead(col(tsCol), 1).over(w))
        .withColumn(s"interp_$valueCol",
          col("_pv") + (col("_nv") - col("_pv")) *
            (us(col(tsCol)) - us(col("_pt"))) / (us(col("_nt")) - us(col("_pt"))))
        .drop("_pv", "_nv", "_pt", "_nt")
    }

    /** Per-key order-N IIR filter (scipy lfilter semantics, zero
      * initial state): y determined by the (b, a) coefficient vectors —
      * the generalization of the reference's Butterworth low-pass
      * (point/utils/filters.py:18-27). Scale path: repartition by key +
      * sortWithinPartitions + one streaming fold per partition — state
      * is O(filter order) per key, NEVER the whole per-key series in
      * memory (a hot key cannot OOM a task). Appends `outCol`.
      *
      * Null `valueCol` rows pass through with a null `outCol` and do
      * NOT advance the filter state (they are not samples) — matching
      * the engine's null-tolerant Column operators rather than failing
      * mid-task. */
    def iirFilter(keyCol: String, orderCols: Seq[String], valueCol: String,
        b: Array[Double], a: Array[Double], outCol: String = "filtered"): DataFrame = {
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val outSchema = StructType(df.schema.fields :+ StructField(outCol, DoubleType))
      val ki = df.schema.fieldIndex(keyCol)
      val vi = df.schema.fieldIndex(valueCol)
      df.repartition(col(keyCol))
        .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
        .mapPartitions { it =>
          var curKey: Any = null
          var state: Array[Double] = null
          it.map { r =>
            val k = r.get(ki)
            if (state == null || !java.util.Objects.equals(k, curKey)) {
              curKey = k
              state = graft.functions.IIR.newState(b, a)
            }
            if (r.isNullAt(vi)) Row.fromSeq(r.toSeq :+ null)
            else Row.fromSeq(r.toSeq :+ graft.functions.IIR.step(b, a, state, r.getDouble(vi)))
          }
        }(Encoders.row(outSchema))
    }

    /** Banded tolerance (range) join: rows of `right` whose `rightX` is
      * within ±`delta` of this frame's `leftX`, under equal `keyCols`.
      * Both sides bucket x into width-`delta` bins and the LEFT side
      * expands to bins ±1, so the join is EQUI on (keys..., bin) with
      * residual |rx - lx| <= delta — candidates are bounded to a
      * 3-bin neighborhood instead of the key's whole range (lossless:
      * any row within ±delta of lx lies in bins floor(lx/delta) ± 1).
      * The one shared implementation behind q18/q45/q47. Column names
      * other than keyCols must be disjoint across the two sides. */
    def bandedToleranceJoin(right: DataFrame, keyCols: Seq[String],
        leftX: String, rightX: String, delta: Double): DataFrame = {
      require(!df.columns.contains("_tbin") && !right.columns.contains("_tbin"),
        "bandedToleranceJoin reserves the column name _tbin")
      val shared = (df.columns.toSet & right.columns.toSet) -- keyCols
      require(shared.isEmpty,
        "bandedToleranceJoin: columns other than the join keys must be " +
          s"disjoint across the two sides (rename before joining); shared: " +
          shared.toSeq.sorted.mkString(", "))
      def bin(c: Column) = floor(c / lit(delta)).cast("long")
      val l = df.withColumn("_tbin",
        explode(array(bin(col(leftX)) - 1, bin(col(leftX)), bin(col(leftX)) + 1)))
      val r = right.withColumn("_tbin", bin(col(rightX)))
      l.join(r, keyCols :+ "_tbin")
        .filter(abs(col(rightX) - col(leftX)) <= lit(delta))
        .drop("_tbin")
    }

    /** Exact n-gram Jaccard near-duplicate pairs with a document-
      * frequency fence: shingles appearing in more than `maxShingleDf`
      * documents are excluded from CANDIDATE GENERATION, capping
      * per-shingle pair fan-out at maxShingleDf²/2 — without the fence a
      * corpus-wide common shingle makes candidate generation quadratic
      * in corpus size (the 100-TB straggler case). Set sizes stay
      * uncapped, so for corpora where no shingle exceeds the cap the
      * result equals the unfenced exact Jaccard.
      *
      * Round-7: the shingle table is built by the map-only array
      * formulation (see [[ngramShingles]]) instead of the window
      * formulation — one full exchange + sort of the token table
      * removed per call; the join/sizes structure is unchanged (a
      * sizes-ride-along variant and a collect_list pair-expansion
      * variant both measured WORSE: the former forces the shingle array
      * through the Generate output per exploded row, the latter
      * evaluates nested HOFs interpreted per element — guide §1.1,
      * switch back when the empirical loop disagrees). */
    def ngramJaccardPairs(keyCol: String, textCol: String, n: Int = 3,
        minJaccard: Double = 0.2, maxShingleDf: Int = 0): DataFrame = {
      val ka = s"${keyCol}_a"
      val kb = s"${keyCol}_b"
      val sh = Materialize(ngramShingles(keyCol, textCol, n))
      val sizes = sh.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
      val joinable = if (maxShingleDf > 0) {
        sh.withColumn("_df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
          .filter(col("_df") <= maxShingleDf).drop("_df")
      } else sh
      val a = joinable.select(col(keyCol).as(ka), col("shingle"))
      val b = joinable.select(col(keyCol).as(kb), col("shingle"))
      val inter = a.join(b, Seq("shingle"))
        .filter(col(ka) < col(kb))
        .groupBy(col(ka), col(kb))
        .agg(count(lit(1)).as("_inter"))
      inter
        .join(sizes.select(col(keyCol).as(ka), col("_n").as("_na")), ka)
        .join(sizes.select(col(keyCol).as(kb), col("_n").as("_nb")), kb)
        .withColumn("jaccard",
          round(col("_inter").cast("double") / (col("_na") + col("_nb") - col("_inter")).cast("double"), 6))
        .filter(col("jaccard") >= minJaccard)
        .select(col(ka), col(kb), col("jaccard"))
    }

    /** Distinct word-level n-gram shingles: (passthrough keyCol,
      * shingle). Round-7 rewrite: built map-side from the split-token
      * array — tokenize, assemble sliding n-grams, per-doc dedup
      * (array_distinct ≡ the old global distinct, the key being part of
      * every row) in one map stage, with [[Graft.fanOut]] supplying
      * parallelism when the scan is split-starved. The window-lead
      * formulation this replaces paid a full exchange + sort of the
      * TOKEN table per call (guide §2.4 — an accidental shuffle).
      *
      * PLAN SHAPE CONSTRAINT (measured 40x, see OPTIMIZATION_r07.md):
      * the array expression must stay INLINE as the explode argument
      * and be referenced NOWHERE else — staging it through a projection
      * attribute, or referencing it a second time (e.g. a size() in the
      * same select), makes GenerateExec carry/recompute the whole array
      * per exploded OUTPUT row: O(shingles²) per doc. */
    def ngramShingles(keyCol: String, textCol: String, n: Int = 3): DataFrame = {
      Graft.fanOut(df, col(keyCol))
        .select(col(keyCol), split(trim(lower(col(textCol))), "\\s+").as("_ws"))
        .select(col(keyCol), explode(array_distinct(
          when(size(col("_ws")) >= n,
            transform(sequence(lit(0), size(col("_ws")) - n), i =>
              concat_ws(" ", (0 until n).map(j => element_at(col("_ws"), i + lit(j + 1))): _*)))
            .otherwise(array().cast("array<string>")))).as("shingle"))
    }

    /** MinHash signatures over n-gram shingles: (keyCol, sig:array<long>).
      * Explode + k codegen'd `min` aggregates. */
    def minhashSignatures(keyCol: String, textCol: String, k: Int = 16, n: Int = 3): DataFrame = {
      val sh = ngramShingles(keyCol, textCol, n)
      val mins = (0 until k).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"_m$i"))
      sh.groupBy(col(keyCol)).agg(mins.head, mins.tail: _*)
        .select(col(keyCol), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
    }

    /** MinHash + LSH banding near-duplicate candidate pairs with
      * estimated similarity — candidate generation is an equi-join on
      * (band, bucket-hash), NEVER an all-pairs product. Output:
      * (<key>_a, <key>_b, est_sim). */
    def minhashCandidatePairs(keyCol: String, textCol: String, k: Int = 16,
        bands: Int = 4, minSim: Double = 0.25): DataFrame = {
      val rowsPerBand = k / bands
      val sig = Materialize(minhashSignatures(keyCol, textCol, k))
      val banded = sig.select(col(keyCol), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
        .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bucket")
      val a = banded.select(col("_band"), col("_bucket"), col(keyCol).as(s"${keyCol}_a"))
      val b = banded.select(col("_band"), col("_bucket"), col(keyCol).as(s"${keyCol}_b"))
      val candidates = a.join(b, Seq("_band", "_bucket"))
        .filter(col(s"${keyCol}_a") < col(s"${keyCol}_b"))
        .select(col(s"${keyCol}_a"), col(s"${keyCol}_b")).distinct()
      candidates
        .join(sig.select(col(keyCol).as(s"${keyCol}_a"), col("sig").as("_sa")), s"${keyCol}_a")
        .join(sig.select(col(keyCol).as(s"${keyCol}_b"), col("sig").as("_sb")), s"${keyCol}_b")
        .withColumn("est_sim",
          aggregate(zip_with(col("_sa"), col("_sb"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / k.toDouble)
        .filter(col("est_sim") >= minSim)
        .select(col(s"${keyCol}_a"), col(s"${keyCol}_b"), col("est_sim"))
    }

    /** 64-bit SimHash signatures: (keyCol, sim:long). Explode + 64
      * codegen'd sum aggregates. */
    def simhashSignatures(keyCol: String, textCol: String): DataFrame = {
      val votes = (0 until 64).map(b => sum(
        when(call_function("shiftright", col("_h"), lit(b)).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)).as(s"_v$b"))
      val assembled = (0 until 64).map(b =>
        when(col(s"_v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_.bitwiseOR(_))
      df.select(col(keyCol), explode(split(trim(lower(col(textCol))), "\\s+")).as("_tok"))
        .select(col(keyCol), xxhash64(col("_tok")).as("_h"))
        .groupBy(col(keyCol))
        .agg(votes.head, votes.tail: _*)
        .select(col(keyCol), assembled.as("sim"))
    }

    /** Connected components over an edge list (this frame's `srcCol`,
      * `dstCol` columns): labels every node with the MINIMUM node id
      * reachable from it. The canonicalization step that turns near-dup
      * PAIRS (ngramJaccardPairs / minhashCandidatePairs / SimHash
      * chunk-LSH) into dedup CLUSTERS: keep the min doc of each
      * component, drop the rest — without it, transitive chains
      * (A~B, B~C but A!~C) dedup inconsistently.
      *
      * Algorithm: min-label propagation with POINTER JUMPING — each
      * round (1) every node takes the min label across its neighbors
      * and itself, then (2) labels compress through themselves
      * (label(x) := label(label(x)), the union-find path-halving step),
      * so convergence is O(log diameter) rounds, not O(diameter): a
      * 10^6-node chain needs ~20 rounds, not 10^6. Each round is a
      * bounded number of hash-shuffles of the O(E) edge list — no
      * driver-side graph state, no collect; the edge list is the
      * near-dup PAIR set, which is orders of magnitude smaller than the
      * corpus at 100 TB. Rounds run to a fixpoint (changed-label count
      * = 0) capped at `maxIter`.
      *
      * Output: one row per distinct node, (node, component) in the node
      * column's own type. Per-round state goes through
      * [[Materialize.loopState]] — iterative lineage MUST be cut every
      * round (a round references the previous frame several times, so a
      * persist-only loop grows the logical plan exponentially and the
      * ANALYZER becomes the bottleneck); reliable `checkpoint` under
      * `spark.graft.materialize=checkpoint` on a real cluster. */
    def connectedComponents(srcCol: String, dstCol: String,
        maxIter: Int = 50): DataFrame = {
      // the symmetrization union references the input pair frame TWICE —
      // without a persist the whole upstream pair pipeline runs twice
      // inside the edges job (round-7; measured on q57, where the pair
      // generation is the dominant cost)
      val pairsOnce = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = Materialize.loopState(
        pairsOnce.select(col(srcCol).as("_ca"), col(dstCol).as("_cb"))
          .union(pairsOnce.select(col(dstCol).as("_ca"), col(srcCol).as("_cb")))
          .distinct())
      pairsOnce.unpersist(blocking = false)
      // init: label = min(self, neighbors); every node appears as _ca
      var labels = Materialize.loopState(edges.groupBy(col("_ca").as("node"))
        .agg(least(first(col("_ca")), min(col("_cb"))).as("component")))
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        val trStart = System.nanoTime() // GRAFT_CC_TIMING per-round stamp
        // (1) propagate the min label across edges. The previous label
        // rides along (as `_old`: present exactly once per node, on the
        // self row of the union) so convergence is observable in pass
        // (2) without a separate join+count job per round.
        // prop is referenced twice by the jump join below: a lazy
        // persist makes it compute once WITHOUT a separate
        // materialization job (round-7 — the eager loopState here cost
        // one extra job per round; the round's lineage cut happens once,
        // on `next`, which is all the plan-growth bound needs)
        val prop = edges
          .join(labels.select(col("node").as("_ca"), col("component")), "_ca")
          .select(col("_cb").as("node"), col("component"),
            lit(null).cast(labels.schema("component").dataType).as("_old"))
          .union(labels.withColumn("_old", col("component")))
          .groupBy(col("node")).agg(min(col("component")).as("component"),
            max(col("_old")).as("_old"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // (2) pointer-jump: compress label through its own label; the
        // changed-label count is collected by observe() DURING the same
        // materialization action — no extra job for convergence.
        val obs = org.apache.spark.sql.Observation()
        val next = Materialize.loopState(prop
          .join(prop.select(col("node").as("_jn"), col("component").as("_jc")),
            col("component") === col("_jn"), "left")
          .select(col("node"), coalesce(col("_jc"), col("component")).as("component"),
            col("_old"))
          .observe(obs, sum(when(col("component") =!= col("_old"), 1L).otherwise(0L))
            .as("changed"))
          .drop("_old"))
        changed = obs.get.get("changed").collect { case l: Long => l }.getOrElse(0L)
        if (sys.env.contains("GRAFT_CC_TIMING"))
          System.err.println(f"[cc] round=$iter changed=$changed " +
            f"wall=${(System.nanoTime() - trStart) / 1e9}%.2fs")
        labels.unpersist()
        prop.unpersist()
        labels = next
        iter += 1
      }
      if (changed > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"connectedComponents did not converge in $maxIter rounds " +
            s"($changed labels still changing) — returned labels may merge " +
            "incompletely; raise maxIter")
      edges.unpersist()
      labels
    }

    /** One-call fuzzy dedup: MinHash-LSH near-dup candidate pairs ->
      * connected components -> drop every doc that is not its cluster's
      * minimum id. Transitive chains (A~B, B~C, A!~C) collapse to one
      * kept doc; docs in no pair pass through untouched. All input
      * columns are retained; the removal join is a left_anti on the
      * loser-id set (O(losers), broadcastable when small). */
    def dedupNearDuplicates(keyCol: String, textCol: String, k: Int = 16,
        bands: Int = 4, minSim: Double = 0.5): DataFrame = {
      val losers = df
        .minhashCandidatePairs(keyCol, textCol, k, bands, minSim)
        .connectedComponents(s"${keyCol}_a", s"${keyCol}_b")
        .filter(col("node") =!= col("component"))
        .select(col("node").as(keyCol))
      df.join(losers, Seq(keyCol), "left_anti")
    }

    /** Brute-force cosine top-k neighbors of each row in `queries`
      * (broadcast) — native codegen CosineSimilarity kernel. Inputs
      * need (idCol, vecCol) on both sides. */
    def knnCosine(queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      df.crossJoin(broadcast(q))
        .filter(col(idCol) =!= col("query_id"))
        .select(col("query_id"), col(idCol).as("neighbor_id"),
          graft.functions.CosineSimilarity(col(vecCol), col("_qv")).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
    }
  }
}
