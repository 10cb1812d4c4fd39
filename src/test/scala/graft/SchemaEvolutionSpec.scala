package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Mid-stream schema evolution: the log ramps v1 -> v2 (add stars) ->
  * v3 (rename to stargazers) -> v4 (widen to long) across epochs; the
  * lake's delta files must physically carry the era schemas, and the
  * aligned final state must match the oracle fold.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val cfg = GenConfig(numEvents = 12000L, numRepos = 30L, pathsPerRepo = 10L,
    schemaRamp = Seq(0.3, 0.6, 0.85))

  test("registry: physical schemas per era") {
    assert(SchemaRegistry.physicalSchema(1).fieldNames.toSeq == Seq("commit", "lang", "content"))
    assert(SchemaRegistry.physicalSchema(2).fieldNames.toSeq ==
      Seq("commit", "lang", "content", "stars"))
    assert(SchemaRegistry.physicalSchema(3).fieldNames.toSeq ==
      Seq("commit", "lang", "content", "stargazers"))
    assert(SchemaRegistry.physicalSchema(2)("stars").dataType.typeName == "integer")
    assert(SchemaRegistry.physicalSchema(4)("stargazers").dataType.typeName == "long")
  }

  test("evolving replay matches oracle; files carry era schemas") {
    val dir = TestSpark.tmpDir("cdc-evolve")
    // epochs aligned with the ramp so early epochs are pure v1
    Pipeline.runBatchEpochs(spark, cfg, s"$dir/t", epochs = 8)
    val table = new LakeTable(s"$dir/t")

    // physical era check: at least one delta group written WITHOUT any
    // stars/stargazers column, at least one WITH stars (int, v2 era),
    // and at least one WITH stargazers
    val snap = table.latest().get
    assert(snap.schemaVersion == 4)
    val groupSchemas = snap.groups.map { g =>
      spark.read.parquet(s"${table.root}/${g.dir}").schema.fieldNames.toSet
    }
    assert(groupSchemas.exists(s => !s.contains("stars") && !s.contains("stargazers")),
      "expected a pure-v1 delta group")
    assert(groupSchemas.exists(_.contains("stars")), "expected a v2-era delta group")
    assert(groupSchemas.exists(_.contains("stargazers")), "expected a v3+/era delta group")

    // logical check: aligned final state equals oracle
    val got = table.read(spark)
    val want = Oracle.fold(spark, ChangeLogGen.events(spark, cfg).drop("delivery"))
    val cols = Seq("repo", "path", "lsn", "commit", "lang", "content", "stargazers")
    assert(got.select(cols.map(col): _*).exceptAll(want.select(cols.map(col): _*)).count() == 0)
    assert(want.select(cols.map(col): _*).exceptAll(got.select(cols.map(col): _*)).count() == 0)

    // v1-era keys never updated again must surface with null stargazers
    assert(got.filter(col("stargazers").isNull).count() > 0)

    // compaction rewrites everything at the current schema and preserves state
    val d0 = Oracle.digest(got, cols)
    table.compact(spark)
    assert(Oracle.digest(table.read(spark), cols) == d0)
    val baseSchema = spark.read.parquet(
      s"${table.root}/${table.latest().get.groups.head.dir}").schema
    assert(baseSchema.fieldNames.contains("stargazers"))
    assert(baseSchema("stargazers").dataType.typeName == "long")
  }
}
