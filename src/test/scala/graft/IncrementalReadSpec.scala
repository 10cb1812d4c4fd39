package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Apply, LakeTable}

/** The chain-CDC-stages guarantee: a downstream consumer that tails the
  * table via readChanges and folds the per-epoch change rows with the
  * same LWW rule must reconstruct exactly the table's full read —
  * including delete tombstones, which appear in the change feed (op='D')
  * but drop out of the reconstructed state.
  */
class IncrementalReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("union of incremental reads folds to the full read, deletes included") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val rows = (0 until 300).map { i =>
      val op = if (i >= 200 && i % 5 == 0) "D" else "U"
      (op, i.toLong, new java.sql.Timestamp(1700000000000L + i), 1,
        s"r${(i % 60) % 7}", s"p${i % 60}", null: String,
        if (op == "D") null
        else s"""{"commit":"c$i","lang":"en","content":"body$i"}""")
    }
    val env = rows.toDF("op", "lsn", "ts", "schemaVersion", "repo", "path", "before", "after")
    val table = new LakeTable(dir)
    (0 until 3).foreach(e =>
      Apply.applyEpoch(spark, table, env.filter(col("lsn") % 3 === e),
        e.toLong, versionHint = Some(1)))

    // tombstones must be visible in the change feed
    val feed3 = table.readChanges(spark, 2, 3)
    assert(feed3.filter(col("op") === "D").count() > 0, "no tombstones in change feed")

    // chain: fold the three change feeds with the same LWW + tombstone
    // rule and compare against the direct full read
    val chained = (1 to 3).map(v => table.readChanges(spark, v - 1, v))
      .reduce(_.unionByName(_))
      .groupBy(col("repo"), col("path"))
      .agg(max_by(struct(col("op"), col("lsn"), col("content")), col("lsn")).as("s"))
      .filter(col("s.op") =!= "D")
      .select(col("repo"), col("path"), col("s.lsn").as("lsn"), col("s.content").as("content"))
    val full = table.read(spark).select("repo", "path", "lsn", "content")
    assert(chained.exceptAll(full).isEmpty && full.exceptAll(chained).isEmpty,
      "chained incremental reads diverge from the full read")
    // and deletes really removed keys
    assert(full.count() < 60, "expected some keys fully deleted")
  }
}
