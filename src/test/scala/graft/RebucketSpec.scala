package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Apply, LakeTable}

/** Online bucket-count migration (LakeTable.rebucket): state identical
  * across the boundary, subsequent writers/readers/point-lookups hash
  * with the new count, time travel still reads the old layout, and
  * incremental reads surface the rewrite as a resync boundary.
  */
class RebucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def env(lo: Int, hi: Int) = {
    val rows = (lo until hi).map { i =>
      ("U", i.toLong, new java.sql.Timestamp(1700000000000L + i), 1,
        s"r${i % 17}", s"p$i",
        null: String, s"""{"commit":"c$i","lang":"en","content":"body$i"}""")
    }
    rows.toDF("op", "lsn", "ts", "schemaVersion", "repo", "path", "before", "after")
  }

  private def stateMap(t: LakeTable) =
    t.read(spark).select("repo", "path", "lsn", "content").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3))).toMap

  test("rebucket preserves state exactly and switches the manifest count") {
    val dir = TestSpark.tmpDir("graft-rbk")
    val table = new LakeTable(dir)
    Apply.applyEpoch(spark, table, env(0, 150), 0L, versionHint = Some(1))
    val before = stateMap(table)
    assert(table.bucketCount == 32)

    assert(table.rebucket(spark, 128))
    assert(table.bucketCount == 128)
    assert(stateMap(table) == before, "state diverged across the rebucket")
    // idempotent at the same count: no rewrite, still true
    val v = table.latest().get.version
    assert(table.rebucket(spark, 128))
    assert(table.latest().get.version == v, "same-count rebucket must be a no-op")
  }

  test("writers after a rebucket land in the new bucketing; point lookup prunes to it") {
    val dir = TestSpark.tmpDir("graft-rbk2")
    val table = new LakeTable(dir)
    Apply.applyEpoch(spark, table, env(0, 100), 0L, versionHint = Some(1))
    assert(table.rebucket(spark, 8))
    // an upsert AFTER the migration must hash with the manifest's count
    Apply.applyEpoch(spark, table, env(100, 160), 1L, versionHint = Some(1))
    val all = stateMap(table)
    assert(all.size == 160)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = table.readKey(spark, "r3", "p122") // written post-rebucket
      val got = df.collect()
      assert(got.length == 1 && got(0).getAs[String]("content") == "body122")
      val scanned = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
      val allFiles = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
          .count(p => p.toString.endsWith(".parquet") && p.toString.contains("bucket="))
      }
      assert(scanned < allFiles,
        s"point lookup scanned $scanned of $allFiles files — no pruning under the new count")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("time travel across the boundary; incremental reads resync at it") {
    val dir = TestSpark.tmpDir("graft-rbk3")
    val table = new LakeTable(dir)
    Apply.applyEpoch(spark, table, env(0, 80), 0L, versionHint = Some(1))
    val v1 = table.latest().get.version
    val before = stateMap(table)
    assert(table.rebucket(spark, 64))
    val v2 = table.latest().get.version
    Apply.applyEpoch(spark, table, env(80, 120), 1L, versionHint = Some(1))
    val v3 = table.latest().get.version

    // pre-rebucket snapshot reads exactly the old state
    val tt = table.readVersion(spark, v1).select("repo", "path", "lsn", "content")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(tt == before)

    // a range crossing the rewrite is refused...
    intercept[IllegalStateException] { table.readChanges(spark, v1, v3).collect() }
    // ...and the chunked fallback reports the rebucket as a resync
    // boundary while returning the post-boundary changes
    val chunked = table.readChangesChunked(spark, v1, v3)
    assert(chunked.resyncVersions.contains(v2))
    assert(chunked.changes.filter(col("lsn") >= 80).count() == 40)
  }
}
