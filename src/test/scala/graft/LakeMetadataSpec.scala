package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Table-metadata contracts added in round 4:
  *  - the bucket count is TABLE metadata (persisted in the manifest,
  *    like Iceberg's bucket transform), so readers/writers constructed
  *    with a different default still hash into the committed buckets —
  *    previously `new LakeTable(dir)` with the default 32 against an
  *    8-bucket table point-pruned to the wrong directory and returned
  *    empty for existing keys;
  *  - expireSnapshots under time travel: orphan data dirs really leave
  *    the disk while every KEPT version still reads exactly;
  *  - the audit side table's file count stays O(compactions), not
  *    O(epochs), over a long replay.
  */
class LakeMetadataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def mkBatch(keys: Seq[(String, String)], lsn0: Long): DataFrame =
    keys.zipWithIndex.map { case ((r, p), i) =>
      (r, p, "U", lsn0 + i, ts, s"c$lsn0", "scala", s"content-$r-$p-$lsn0")
    }.toDF("repo", "path", "op", "lsn", "ts", "commit", "lang", "content")

  private def stateMap(df: DataFrame): Map[(String, String), (Long, String)] =
    df.select("repo", "path", "lsn", "content").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3))).toMap

  private def dataDirs(root: String): Set[String] =
    scala.util.Using.resource(Files.list(Paths.get(root, "data"))) { st =>
      st.iterator().asScala.map(_.getFileName.toString).toSet
    }

  test("numBuckets is table metadata: a default-constructed reader/writer honors it") {
    val dir = TestSpark.tmpDir("cdc-nb") + "/t"
    val keys = (0 until 60).map(i => (s"repo$i", s"src/f$i.scala"))
    val writer = new LakeTable(dir, numBuckets = 8)
    writer.upsert(mkBatch(keys, 0L), 0L, 1)

    // reopen with the DEFAULT bucket count (32) — the ADVICE bug shape
    val reopened = new LakeTable(dir)
    assert(reopened.bucketCount == 8, "manifest numBuckets must win over the constructor")

    // point lookups through the default instance find every key
    keys.take(10).foreach { case (r, p) =>
      val got = reopened.readKey(spark, r, p).select("content").collect()
      assert(got.length == 1 && got(0).getString(0) == s"content-$r-$p-0",
        s"readKey missed ($r,$p) through a default-constructed reader")
    }

    // an upsert through the default instance writes into the COMMITTED
    // 8-bucket scheme (no bucket >= 8 ever appears on disk) and the
    // manifest keeps numBuckets = 8
    reopened.upsert(mkBatch(keys.take(20), 1000L), 1L, 1)
    assert(reopened.latest().get.numBuckets == 8)
    val bucketDirs = dataDirs(dir).flatMap { g =>
      scala.util.Using.resource(Files.list(Paths.get(dir, "data", g))) { st =>
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt).toSeq
      }
    }
    assert(bucketDirs.nonEmpty && bucketDirs.forall(_ < 8),
      s"writer scattered keys outside the committed 8 buckets: $bucketDirs")

    // compaction through the default instance preserves state exactly
    reopened.compactBuckets(spark, minDeltas = 2)
    assert(reopened.latest().get.numBuckets == 8)
    val expected = keys.zipWithIndex.map { case ((r, p), i) =>
      if (i < 20) (r, p) -> (1000L + i, s"content-$r-$p-1000")
      else (r, p) -> (i.toLong, s"content-$r-$p-0")
    }.toMap
    assert(stateMap(reopened.read(spark)) == expected)
    // and point lookups still prune to the right (8-bucket) dirs
    keys.take(5).foreach { case (r, p) =>
      assert(reopened.readKey(spark, r, p).count() == 1)
    }
  }

  test("expireSnapshots under time travel: orphans deleted, kept versions exact") {
    val dir = TestSpark.tmpDir("cdc-vac") + "/t"
    val table = new LakeTable(dir, numBuckets = 4)
    val keys = (0 until 40).map(i => (s"r$i", "a"))
    (0 until 3).foreach { e =>
      table.upsert(mkBatch(keys.drop(e * 10), 1000L * (e + 1)), e.toLong, 1)
    }
    // v1..v3 committed; capture the kept versions' state BEFORE vacuum
    val v2State = stateMap(table.readVersion(spark, 2))
    val v3State = stateMap(table.readVersion(spark, 3))
    val dirsBefore = dataDirs(dir)
    assert(dirsBefore.size == 3)

    table.expireSnapshots(keep = 2)
    // v1's manifest is gone; no group became orphan yet (v2's groups are
    // a subset of v3's in this append-only history), so expire alone
    // deletes nothing — now cross a compaction to CREATE orphans
    assert(table.snapshotAt(1).isEmpty)
    table.compactBuckets(spark, minDeltas = 1) // rewrites everything -> v4
    table.expireSnapshots(keep = 1)
    val dirsAfter = dataDirs(dir)
    // only the compacted base group survives on disk
    assert(dirsAfter.size == 1 && dirsAfter.forall(_.endsWith("-base")),
      s"orphan delta dirs not vacuumed: $dirsAfter")
    // the kept (current) version still reads the exact pre-vacuum state
    assert(stateMap(table.read(spark)) == v3State)
    assert(v2State != v3State, "fixture must distinguish versions")
    // expired versions are gone from history (empty read, not wrong data)
    assert(table.readVersion(spark, 2).isEmpty)
  }

  test("audit file count stays O(compactions) over a many-epoch replay") {
    val dir = TestSpark.tmpDir("cdc-audit")
    val auditDir = s"$dir/audit"
    val audit = new Audit(auditDir)
    val table = new LakeTable(s"$dir/t", numBuckets = 4)
    val keys = (0 until 16).map(i => (s"r$i", "a"))
    def envBatch(lsn0: Long): DataFrame =
      keys.zipWithIndex.map { case ((r, p), i) =>
        ("U", lsn0 + i, ts, 1, r, p, null: String,
          s"""{"commit":"c$lsn0","lang":"scala","content":"x$lsn0-$i"}""")
      }.toDF("op", "lsn", "ts", "schemaVersion", "repo", "path", "before", "after")
    val epochs = 30
    (0 until epochs).foreach { e =>
      val st = Apply.applyEpoch(spark, table, envBatch(100L * e), e.toLong,
        Some(audit), versionHint = Some(1))
      assert(st.committed)
      if (table.deltaGroupCount >= 8) {
        table.compactBuckets(spark, minDeltas = 8)
        audit.compactAsync(spark, maxFiles = 8)
      }
    }
    audit.flush()
    val files = scala.util.Using.resource(Files.list(Paths.get(auditDir))) { st =>
      st.iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    assert(files < epochs / 2, s"audit dir grew O(epochs): $files files for $epochs epochs")
    // compaction preserved every lineage row: one per (epoch, bucket)
    val rows = audit.read(spark)
    assert(rows.select("epoch_id").distinct().count() == epochs.toLong)
    // rows_applied is per (epoch, bucket); per-epoch sums must equal the
    // batch key count — compaction must lose/duplicate no lineage row
    val perEpoch = rows.groupBy("epoch_id")
      .agg(sum("rows_applied").as("n")).select("n").distinct().collect()
    assert(perEpoch.map(_.getLong(0)).toSeq == Seq(keys.size.toLong),
      s"per-epoch lineage sums wrong: ${perEpoch.mkString(",")}")
  }
}
