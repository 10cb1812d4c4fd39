package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** The envelope's before-image slot, end-to-end: a row-image-capturing
  * source (GenConfig.withBeforeImages) feeds Apply.lostUpdateAudit,
  * which must flag exactly the events whose pre-image disagrees with
  * the table state they are applied onto.
  */
class BeforeImageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // exactly-once, in-order source: pre-images are well-defined
  val cfg = GenConfig(numEvents = 8000L, numRepos = 30L, pathsPerRepo = 10L,
    dupEvery = 0L, disorderWindow = 0L, withBeforeImages = true)

  test("generator fills before with the key's previous after-image") {
    val ev = ChangeLogGen.events(spark, cfg).drop("delivery")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("repo"), col("path")).orderBy(col("lsn"))
    val mism = ev.withColumn("_prev", lag(col("after"), 1).over(w))
      .filter(!(col("before") <=> col("_prev")))
      .count()
    assert(mism == 0)
    assert(ev.filter(col("before").isNotNull).count() > 0)
  }

  test("lostUpdateAudit is clean on an honest source and flags injected corruption") {
    val dir = TestSpark.tmpDir("before-image")
    val table = new LakeTable(s"$dir/t")
    val all = ChangeLogGen.events(spark, cfg).drop("delivery")
    val mid = cfg.numEvents / 2
    val epoch0 = all.filter(col("lsn") < mid)
    val epoch1 = all.filter(col("lsn") >= mid)
    Apply.applyEpoch(spark, table, epoch0, 0L)

    // honest pre-images: the first event per key in epoch1 was captured
    // against exactly the state epoch0 left behind -> nothing flagged
    assert(Apply.lostUpdateAudit(spark, table, epoch1).count() == 0)

    // corrupt the pre-image of 3 keys (an out-of-band mutation the
    // capture never saw) -> exactly those keys flagged. Victims must be
    // keys whose FIRST epoch1 event carries a pre-image — the audit
    // checks only the batch boundary (intra-batch pre-images collapse).
    val victims = epoch1
      .groupBy(col("repo"), col("path"))
      .agg(min_by(col("before"), col("lsn")).as("first_before"))
      .filter(col("first_before").isNotNull)
      .select("repo", "path").orderBy("repo", "path").limit(3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val isVictim = victims.foldLeft(lit(false)) { case (acc, (r, p)) =>
      acc || (col("repo") === r && col("path") === p)
    }
    val corrupted = epoch1.withColumn("before",
      when(col("before").isNotNull && isVictim,
        lit("""{"commit":"x","lang":"x","content":"OUT-OF-BAND"}"""))
        .otherwise(col("before")))
    val flagged = Apply.lostUpdateAudit(spark, table, corrupted)
      .select("repo", "path").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(flagged == victims, s"flagged $flagged vs injected $victims")
  }
}
