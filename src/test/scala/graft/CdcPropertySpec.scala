package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Property-style tests (SURVEY.md §5.4): across randomized generator
  * configs (seeded, reproducible), distributed apply ≡ oracle fold; the
  * epoch count, disorder window, duplicate rate and salting never change
  * the result (LWW fold is associative/commutative after dedup). Plain
  * seeded randomization rather than ScalaCheck so the offline build
  * needs no extra bridge artifact; failures print the exact config.
  */
class CdcPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val cols = Seq("repo", "path", "lsn", "commit", "lang", "content", "stargazers")

  test("apply ≡ oracle fold for randomized configs / epoch counts / salting") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 8).foreach { i =>
      val cfg = GenConfig(
        seed = rnd.nextInt(1000000).toLong,
        numEvents = 500L + rnd.nextInt(3500),
        numRepos = 3L + rnd.nextInt(57),
        pathsPerRepo = 1L + rnd.nextInt(11),
        dupEvery = Seq(0L, 3L, 17L)(rnd.nextInt(3)),
        disorderWindow = Seq(0L, 8L, 200L)(rnd.nextInt(3)),
        schemaRamp = if (rnd.nextBoolean()) Seq(0.25, 0.5, 0.75) else Seq(0.9))
      val epochs = 1 + rnd.nextInt(5)
      val salted = rnd.nextBoolean()
      val dir = TestSpark.tmpDir("cdc-prop")
      Pipeline.runBatchEpochs(spark, cfg, s"$dir/t", epochs, salted = salted)
      val got = new LakeTable(s"$dir/t").read(spark).select(cols.map(col): _*)
      val want = Oracle.fold(spark, ChangeLogGen.events(spark, cfg).drop("delivery"))
        .select(cols.map(col): _*)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"case $i mismatch for $cfg epochs=$epochs salted=$salted")
    }
  }
}
