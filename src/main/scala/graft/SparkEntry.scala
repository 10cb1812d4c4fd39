package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` keys must agree, and every aliased output
  * column name must match between the Spark query and the DuckDB SQL.
  */
object SparkEntry {

  /** Flagship: run the full CDC apply pipeline end-to-end on a small
    * synthetic change log (generate -> epoch chunks -> dedup/LWW reduce
    * -> schema-normalize -> bucketed lake upsert -> merge-on-read final
    * state) and return the final table state. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = GenConfig(numEvents = 20000L, numRepos = 50L, pathsPerRepo = 20L)
    Pipeline.runBatchEpochs(spark, cfg, s"$dir/table", epochs = 4)
    new LakeTable(s"$dir/table").read(spark)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.operators.Queries.oracles
}
