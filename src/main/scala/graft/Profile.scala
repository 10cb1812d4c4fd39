package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc._

/** Ad-hoc profiling main (not part of the driver contract). Modes:
  *   queries <sfDir>  — time sub-stages of the slow dedup queries
  *   cdc <cores> <events> — time the stages of one CDC epoch
  */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("queries")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    mode match {
      case "queries" =>
        val dir = args(1)
        val d = spark.read.parquet(s"$dir/documents.parquet")
        val ws = split(trim(lower(col("text"))), "\\s+")
        val sh = d.select(col("doc_id"),
          when(size(ws) >= 3,
            transform(sequence(lit(0), size(ws) - 3), i =>
              concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3))))
            .otherwise(array()).as("sh"))
          .select(col("doc_id"), explode(col("sh")).as("shingle"))
          .distinct()
        time("shingles distinct")(println("shingle rows: " + sh.count()))
        val shc = sh.localCheckpoint(true)
        val a = shc.select(col("doc_id").as("doc_a"), col("shingle"))
        val b = shc.select(col("doc_id").as("doc_b"), col("shingle"))
        val inter = a.join(b, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
        time("pair join+groupBy")(println("pairs: " + inter.count()))
        // shingle frequency skew
        println(shc.groupBy("shingle").count().orderBy(col("count").desc).limit(5).collect().mkString("\n"))

        val mins = (0 until 16).map(k => min(xxhash64(col("shingle"), lit(k))).as(s"m$k"))
        val sig = shc.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
          .select(col("doc_id"), array((0 until 16).map(k => col(s"m$k")): _*).as("sig"))
        time("minhash signatures")(noop(sig))
        time("q25 full")(noop(graft.operators.DedupOps.all("q25_ngram_jaccard")(spark, dir)))
        time("q26 full")(noop(graft.operators.DedupOps.all("q26_dedup_minhash_lsh")(spark, dir)))
        time("q27 full")(noop(graft.operators.DedupOps.all("q27_dedup_simhash")(spark, dir)))
        time("q30 full")(noop(graft.operators.SimilarityOps.all("q30_embed_neardup")(spark, dir)))
        time("q28 full")(noop(graft.operators.SimilarityOps.all("q28_knn_brute")(spark, dir)))

      case "reduce" =>
        val events = args(1).toLong
        val cfg = GenConfig(numEvents = events, numRepos = 5000L, pathsPerRepo = 100L)
        val dir = java.nio.file.Files.createTempDirectory("prof-red").toString
        Pipeline.writeLogSegments(spark, cfg, s"$dir/log", 1, filesPerSegment = 0)
        val log = spark.read.schema(Pipeline.envelopeSchema).parquet(s"$dir/log/seg-00000")
        val valueCols = Seq("op", "lsn", "ts", "schemaVersion", "after")
        (1 to 2).foreach { round =>
          time(s"max_by(struct) [$round]")(noop(Apply.reduce(log)))
          val viaMaxStruct = log
            .groupBy(col("repo"), col("path"))
            .agg(max(struct((col("lsn") +: valueCols.filterNot(_ == "lsn").map(col)): _*)).as("s"))
            .select(col("repo"), col("path"), col("s.lsn").as("lsn"), col("s.op").as("op"),
              col("s.ts").as("ts"), col("s.schemaVersion").as("schemaVersion"), col("s.after").as("after"))
          time(s"max(struct(lsn,...)) [$round]")(noop(viaMaxStruct))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("repo"), col("path")).orderBy(col("lsn").desc)
          time(s"window row_number [$round]")(
            noop(log.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")))
          val maxLsn = log.groupBy(col("repo"), col("path")).agg(max(col("lsn")).as("lsn"))
          time(s"maxlsn+selfjoin [$round]")(noop(log.join(maxLsn, Seq("repo", "path", "lsn"))))
        }
        println("plan max(struct): " + spark.range(0).sparkSession.sessionState.executePlan(
          log.groupBy(col("repo"), col("path")).agg(max(struct(col("lsn"), col("after"))).as("s"))
            .queryExecution.logical).executedPlan.toString.linesIterator.filter(l =>
              l.contains("Aggregate")).mkString(" | "))

      // replay-path stage split over PRE-MATERIALIZED segments (the
      // exact bench hot path): scan | +reduce | +normalize | full epoch
      case "replay" =>
        val logDir = args(1)
        val seg = args.lift(2).getOrElse("seg-00000")
        val log = spark.read.schema(Pipeline.envelopeSchema).parquet(s"$logDir/$seg")
        val dir = java.nio.file.Files.createTempDirectory("prof-rep").toString
        (1 to 2).foreach { round =>
          time(s"scan only [$round]")(noop(log))
          time(s"scan+reduce [$round]")(noop(Apply.reduce(log)))
          // partial-agg bypass experiment: pre-partitioned child ->
          // Spark plans ONE complete-mode hash agg (no map-side pass)
          time(s"scan+reduce complete-mode [$round]") {
            val pre = log.repartition(col("repo"), col("path"))
            noop(Apply.reduce(pre))
          }
          time(s"scan+reduce+normalize [$round]")(
            noop(Apply.normalize(Apply.reduce(log), 4)))
          // parse-FIRST experiment (round-3 verdict #2): normalize before
          // the reduce so `after` shuffles as parsed columns instead of a
          // JSON string — pays the parse on every event (~16x more rows)
          // to shave shuffle bytes
          time(s"scan+parse-first+reduce [$round]")(
            noop(Apply.reduce(Apply.normalize(log, 4))))
          val t = new LakeTable(s"$dir/t$round")
          time(s"full applyEpoch [$round]")(Apply.applyEpoch(spark, t, log, 0L))
          time(s"full epoch parse-first [$round]") {
            val t2 = new LakeTable(s"$dir/pf$round")
            t2.upsert(Apply.reduce(Apply.normalize(log, 4)), 0L, 4)
          }
        }

      // reduce-formulation shootout round 2 (verdict-r3 #2): interleaved
      // warm repetitions in ONE JVM so host noise hits all variants
      case "reduceopt" =>
        val logDir = args(1)
        val log = spark.read.schema(Pipeline.envelopeSchema)
          .parquet(s"$logDir/seg-00000")
          .select("repo", "path", "op", "lsn", "ts", "after")
        noop(log) // warm scan
        (1 to 3).foreach { round =>
          time(s"A baseline max_by reduce [$round]")(noop(Apply.reduce(log)))
          time(s"B two-pass hashagg + bcast join [$round]") {
            val winners = log.groupBy(col("repo"), col("path")).agg(max(col("lsn")).as("lsn"))
            noop(log.join(broadcast(winners), Seq("repo", "path", "lsn"))
              .dropDuplicates(Seq("repo", "path")))
          }
          time(s"C two-pass hashagg + shuffle join [$round]") {
            val winners = log.groupBy(col("repo"), col("path")).agg(max(col("lsn")).as("lsn"))
            noop(log.join(winners, Seq("repo", "path", "lsn"))
              .dropDuplicates(Seq("repo", "path")))
          }
        }

      case "cdc" =>
        val events = args(1).toLong
        val cfg = GenConfig(numEvents = events, numRepos = 5000L, pathsPerRepo = 100L)
        val dir = java.nio.file.Files.createTempDirectory("prof-cdc").toString
        val table = new LakeTable(s"$dir/t")
        val log = Pipeline.withEpoch(ChangeLogGen.events(spark, cfg), cfg, 1)
          .drop("delivery", "epoch")
        time("generate only (envelope cols)")(
          noop(log.select("repo", "path", "lsn", "schemaVersion")))
        time("generate only (full incl after)")(noop(log))
        time("lineage scan")(log.groupBy(table.bucketCol)
          .agg(min("lsn"), max("lsn"), count(lit(1)), max("schemaVersion")).collect())
        val reduced = Apply.reduce(log.select("repo", "path", "op", "lsn", "ts", "schemaVersion", "after"))
        time("reduce (no write)")(noop(reduced))
        val normalized = Apply.normalize(reduced, 4)
        time("reduce+normalize (no write)")(noop(normalized))
        time("full applyEpoch incl write")(
          Apply.applyEpoch(spark, table, log, 0L))
        time("read back (merge-on-read)")(noop(table.read(spark)))

      // per-stage split over PRE-MATERIALIZED segments (either payload
      // layout): scan / scan+reduce / scan+reduce+normalize, no lake
      // write — the reduce/normalize isolation the typed-vs-JSON
      // comparison needs. usage: cdcseg <segDir> (e.g. .../log/seg-00000)
      case "cdcseg" =>
        val segDir = args(1)
        val typed = spark.read.parquet(segDir)
          .schema("after").dataType.isInstanceOf[org.apache.spark.sql.types.StructType]
        val schema = if (typed) Pipeline.typedEnvelopeSchema else Pipeline.envelopeSchema
        println(s"[profile] layout=${if (typed) "typed" else "json"} seg=$segDir")
        def batch() = spark.read.schema(schema).parquet(segDir)
          .select("repo", "path", "op", "lsn", "ts", "after")
        (1 to 3).foreach { i =>
          time(s"run$i scan only")(noop(batch()))
          time(s"run$i scan+reduce")(noop(Apply.reduce(batch())))
          time(s"run$i scan+reduce+normalize")(noop(Apply.normalize(Apply.reduce(batch()), 4)))
        }

      // latest() cost vs retained-manifest count, HEAD hint vs listing
      // fallback. usage: lakehead [manifests] [calls]
      case "lakehead" =>
        val n = args.lift(1).map(_.toInt).getOrElse(20000)
        val calls = args.lift(2).map(_.toInt).getOrElse(2000)
        val dir = java.nio.file.Files.createTempDirectory("prof-head").toString
        val table = new LakeTable(s"$dir/t", numBuckets = 4)
        import org.apache.spark.sql.functions.lit
        val one = spark.range(1).select(
          lit("r").as("repo"), lit("p").as("path"), lit("U").as("op"),
          lit(0L).as("lsn"), lit(new java.sql.Timestamp(0L)).as("ts"),
          lit("c").as("commit"), lit("en").as("lang"), lit("x").as("content"))
        table.upsert(one, 0L, 1)
        // clone the committed manifest to n retained versions (pure
        // metadata replication — the listing cost is what's measured)
        val mdir = java.nio.file.Paths.get(s"$dir/t/manifests")
        val v1 = new String(java.nio.file.Files.readAllBytes(mdir.resolve("v000000001.json")), "UTF-8")
        (2 to n).foreach { v =>
          java.nio.file.Files.write(mdir.resolve(f"v$v%09d.json"),
            v1.replace("\"version\" : 1", s""""version" : $v""").getBytes("UTF-8"))
        }
        java.nio.file.Files.write(mdir.resolve("HEAD"), n.toString.getBytes("UTF-8"))
        time(s"$calls x latest() WITH head hint, $n retained manifests")(
          (1 to calls).foreach(_ => assert(table.latest().get.version == n)))
        java.nio.file.Files.delete(mdir.resolve("HEAD"))
        time(s"$calls x latest() listing fallback, $n retained manifests")(
          (1 to calls).foreach(_ => assert(table.latest().get.version == n)))
    }
    spark.stop()
  }
}
// appended: reduce-formulation shootout (see `case "reduce"` dispatch added below)
