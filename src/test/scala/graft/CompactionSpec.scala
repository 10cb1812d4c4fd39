package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Per-bucket incremental compaction (round-2 verdict #10 — the Iceberg
  * binpack analogue): only buckets whose live delta-group count reaches
  * the threshold are rewritten; untouched buckets' files stay
  * byte-identical on disk, the table state digest is invariant, and the
  * incremental-read contract refuses ranges that cross the compaction.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def mkBatch(keys: Seq[(String, String)], lsn0: Long): DataFrame =
    keys.zipWithIndex.map { case ((r, p), i) =>
      (r, p, "U", lsn0 + i, ts, s"c$lsn0", "scala", s"content-$r-$lsn0")
    }.toDF("repo", "path", "op", "lsn", "ts", "commit", "lang", "content")

  private def fileInventory(root: String, dir: String): Map[String, Long] =
    scala.util.Using.resource(Files.walk(Paths.get(root, dir))) { st =>
      st.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    }

  private val stateCols =
    Seq("repo", "path", "lsn", "commit", "lang", "content", "stargazers")

  private def assertSameState(a: DataFrame, b: DataFrame): Unit = {
    val (ga, gb) = (a.select(stateCols.map(col): _*), b.select(stateCols.map(col): _*))
    assert(ga.exceptAll(gb).count() == 0 && gb.exceptAll(ga).count() == 0)
  }

  test("compactBuckets rewrites ONLY hot buckets; state and cold files invariant") {
    val dir = TestSpark.tmpDir("cdc-binpack")
    val table = new LakeTable(s"$dir/t", numBuckets = 8)
    val control = new LakeTable(s"$dir/control", numBuckets = 8)

    val allKeys = (0 until 64).map(i => (s"repo$i", "src/a"))
    val buckets = allKeys.toDF("repo", "path")
      .select(col("repo"), col("path"),
        pmod(xxhash64(col("repo"), col("path")), lit(8L)).as("b"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt).toMap
    val hotBucket = buckets(allKeys.head)
    val hotKeys = allKeys.filter(k => buckets(k) == hotBucket)
    assert(hotKeys.size < allKeys.size, "need cold buckets too")

    // epoch 0 touches every bucket; epochs 1..3 only the hot bucket
    for (t <- Seq(table, control)) {
      t.upsert(mkBatch(allKeys, 0L), 0L, 1)
      (1 to 3).foreach(e => t.upsert(mkBatch(hotKeys, 1000L * e), e.toLong, 1))
    }
    val sBefore = table.latest().get
    assert(sBefore.totalDeltaGroups == 4)
    val coldGroupDir = sBefore.groups.head.dir // epoch 0: the only group with cold buckets
    val coldInventoryBefore = fileInventory(table.root, coldGroupDir)

    // hot bucket has 4 live delta groups, cold buckets 1 -> threshold 3
    // must compact exactly the hot bucket
    val compacted = table.compactBuckets(spark, minDeltas = 3)
    assert(compacted == Set(hotBucket), s"expected {$hotBucket}, got $compacted")

    val sAfter = table.latest().get
    // epoch-0 group survives with the hot bucket excluded; the
    // hot-only epoch groups are fully superseded and drop out
    assert(sAfter.groups.count(_.kind == "delta") == 1)
    val keptDelta = sAfter.groups.find(_.kind == "delta").get
    assert(keptDelta.dir == coldGroupDir)
    assert(keptDelta.excludedBuckets == Set(hotBucket))
    // the new base group holds ONLY the hot bucket's partitions
    val base = sAfter.groups.find(_.kind == "base").get
    val baseBuckets = scala.util.Using.resource(Files.list(Paths.get(table.root, base.dir))) {
      _.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("bucket=")).toSet
    }
    assert(baseBuckets == Set(s"bucket=$hotBucket"))
    // untouched (cold) files byte-identical: same paths, same mtimes
    assert(fileInventory(table.root, coldGroupDir) == coldInventoryBefore,
      "per-bucket compaction must not rewrite cold buckets' files")

    // state digest invariant vs the uncompacted control table
    assertSameState(table.read(spark), control.read(spark))

    // idempotence: nothing left above threshold -> no-op, no snapshot
    assert(table.compactBuckets(spark, minDeltas = 3).isEmpty)
    assert(table.latest().get.version == sAfter.version)

    // incremental reads must refuse ranges crossing the compaction
    intercept[IllegalStateException] {
      table.readChanges(spark, sBefore.version - 1, sAfter.version)
    }

    // new epochs keep flowing after the partial compaction
    table.upsert(mkBatch(hotKeys, 9000L), 4L, 1)
    control.upsert(mkBatch(hotKeys, 9000L), 4L, 1)
    assertSameState(table.read(spark), control.read(spark))
  }
}
