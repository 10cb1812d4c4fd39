package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Apply, DeadLetterQueue, LakeTable}

/** Dead-letter queue: poison pills are quarantined with their raw
  * envelope + reason, the stream keeps moving, the lake never sees
  * them, and the quarantine set is epoch-idempotent.
  */
class DlqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i)
  private def json(i: Int) =
    s"""{"commit":"c$i","lang":"en","content":"body$i"}"""

  test("poison pills quarantined with reasons; clean rows applied; replay idempotent") {
    val base = TestSpark.tmpDir("graft-dlq")
    val table = new LakeTable(s"$base/table")
    val dlq = new DeadLetterQueue(s"$base/dlq")
    val rows = Seq(
      // clean key
      ("U", 1L, ts(1), 1, "r1", "pA", null: String, json(1)),
      // malformed payload at the key's HIGHEST lsn -> whole key quarantined
      ("U", 2L, ts(2), 1, "r1", "pB", null: String, json(2)),
      ("U", 3L, ts(3), 1, "r1", "pB", null: String, "{not json"),
      // poisoned event DISPLACED by a higher clean lsn -> invisible
      ("U", 4L, ts(4), 1, "r1", "pC", null: String, "also-garbage"),
      ("U", 5L, ts(5), 1, "r1", "pC", null: String, json(5)),
      // unknown op
      ("X", 6L, ts(6), 1, "r1", "pD", null: String, json(6)),
      // null key
      ("U", 7L, ts(7), 1, "r1", null: String, null: String, json(7)))
    val env = rows.toDF("op", "lsn", "ts", "schemaVersion", "repo", "path", "before", "after")

    val st = Apply.applyEpoch(spark, table, env, 0L, versionHint = Some(1), dlq = Some(dlq))
    assert(st.committed)

    val state = table.read(spark).select("path", "lsn", "content").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(state == Map("pA" -> (1L, "body1"), "pC" -> (5L, "body5")),
      s"lake state wrong: $state")

    val q = dlq.read(spark).select("path", "lsn", "after", "reason", "epoch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(q.toSet == Set(
      ("pB", 3L, "{not json", "malformed_payload", 0L),
      ("pD", 6L, json(6), "unknown_op", 0L),
      (null, 7L, json(7), "null_key", 0L)), s"dlq contents wrong: ${q.toSeq}")

    // idempotent replay of the committed epoch: no table change, no dup
    // quarantine rows, and the skip happens before any quarantine write
    val st2 = Apply.applyEpoch(spark, table, env, 0L, versionHint = Some(1), dlq = Some(dlq))
    assert(!st2.committed)
    assert(dlq.read(spark).count() == 3)
    assert(table.read(spark).count() == 2)
  }

  test("typed (struct) payload: op/key integrity still enforced, after stored as JSON") {
    val base = TestSpark.tmpDir("graft-dlq-t")
    val table = new LakeTable(s"$base/table")
    val dlq = new DeadLetterQueue(s"$base/dlq")
    val rows = Seq(
      ("U", 1L, ts(1), 1, "r1", "pA", ("c1", "en", "body1")),
      ("Z", 2L, ts(2), 1, "r1", "pB", ("c2", "en", "body2")))
    val env = rows.toDF("op", "lsn", "ts", "schemaVersion", "repo", "path", "payload")
      .withColumn("before", lit(null).cast("string"))
      .withColumn("after", struct(
        col("payload._1").as("commit"), col("payload._2").as("lang"),
        col("payload._3").as("content")))
      .drop("payload")

    val st = Apply.applyEpoch(spark, table, env, 0L, versionHint = Some(1), dlq = Some(dlq))
    assert(st.committed)
    assert(table.read(spark).count() == 1)
    val q = dlq.read(spark).select("path", "after", "reason").collect()
    assert(q.length == 1 && q(0).getString(2) == "unknown_op")
    // canonical JSON string whatever the envelope layout
    assert(q(0).getString(1).contains(""""content":"body2""""))
  }

  test("no DLQ configured: behavior unchanged, nothing written anywhere") {
    val base = TestSpark.tmpDir("graft-dlq-off")
    val table = new LakeTable(s"$base/table")
    val env = Seq(("U", 1L, ts(1), 1, "r1", "pA", null: String, json(1)))
      .toDF("op", "lsn", "ts", "schemaVersion", "repo", "path", "before", "after")
    Apply.applyEpoch(spark, table, env, 0L, versionHint = Some(1))
    assert(table.read(spark).count() == 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/dlq")))
  }

  test("empty quarantine set: read() returns the empty frame with the schema") {
    val dlq = new DeadLetterQueue(TestSpark.tmpDir("graft-dlq-e") + "/dlq")
    val df = dlq.read(spark)
    assert(df.isEmpty)
    assert(df.columns.toSeq ==
      Seq("repo", "path", "op", "lsn", "ts", "after", "reason", "epoch"))
  }
}
