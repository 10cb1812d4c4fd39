package graft.cdc

import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Footer-statistics probes over parquet directories.
  *
  * The apply stage needs the batch's max `schemaVersion` BEFORE writing
  * (it picks the era-physical write schema), which naively costs one
  * extra column-pruned pass over every batch — a full per-epoch scan at
  * the 10^10-event design point. Binlog segments are parquet, and
  * parquet row groups already carry min/max statistics per column, so
  * the probe can be answered from file footers alone: O(files) metadata
  * reads, zero data scanned. (The same trick Spark's
  * `spark.sql.parquet.aggregatePushDown` applies for DSv2 scans.)
  */
object ParquetStats {

  /** Max value of an INT32 column across all row groups of all parquet
    * files under `dir`, from footer statistics only. None when the
    * directory has no parquet files or a footer lacks stats for the
    * column (caller falls back to a scan). */
  def maxInt(spark: SparkSession, dir: String, column: String): Option[Int] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    maxIntOfFiles(spark,
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).toSeq,
      column)
  }

  /** Same probe over an EXPLICIT file list — the streaming path's form:
    * a file-source micro-batch exposes its backing files via
    * `DataFrame.inputFiles`, so the era probe costs O(batch files)
    * footer reads instead of one column-pruned pass over the batch.
    * None on an empty list or any missing per-column stats. */
  def maxIntOfFiles(spark: SparkSession, files: Seq[String], column: String): Option[Int] = {
    val conf = spark.sessionState.newHadoopConf()
    var sawAll = true
    val maxes = files.iterator.filter(_.endsWith(".parquet")).flatMap { f =>
      // an unreadable/truncated file must not turn this optimization
      // into a hard failure — fall back to the scan probe instead
      scala.util.Try {
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), conf))
        try {
          reader.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == column) match {
              case Some(c) if c.getStatistics != null && c.getStatistics.hasNonNullValue =>
                Some(c.getStatistics.genericGetMax.asInstanceOf[Number].intValue)
              case _ =>
                sawAll = false; None
            }
          }.toList
        } finally reader.close()
      }.getOrElse { sawAll = false; Nil }
    }.toList
    if (maxes.nonEmpty && sawAll) Some(maxes.max) else None
  }
}
