package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiments for the round-7 optimization work (dev-only, not
  * part of the driver contract). Each case isolates one pipeline stage
  * with the bench session config. */
object Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[lab] $label%-50s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    args.headOption.getOrElse("sig") match {
      case "sig" =>
        import graft.Graft._
        // stage isolation of the q26 signature pipeline, 2 reps each
        (1 to 2).foreach { r =>
          time(s"[$r] shingles (window formulation)")(
            noop(docs.ngramShingles("doc_id", "text", 3)))
          val ws = split(trim(lower(col("text"))), "\\s+")
          val arrShingles = docs
            .select(col("doc_id"), ws.as("_ws"))
            .select(col("doc_id"), explode(
              when(size(col("_ws")) >= 3,
                transform(sequence(lit(0), size(col("_ws")) - 3), i =>
                  concat_ws(" ", element_at(col("_ws"), i + 1),
                    element_at(col("_ws"), i + 2), element_at(col("_ws"), i + 3))))
                .otherwise(array())).as("shingle"))
            .distinct()
          time(s"[$r] shingles (array formulation)")(noop(arrShingles))
          val mins = (0 until 16).map(k =>
            min(md5(concat_ws("#", col("shingle"), lit(k)))).as(s"m$k"))
          time(s"[$r] sig: window-shingles + agg(min md5 x16)") {
            noop(docs.ngramShingles("doc_id", "text", 3)
              .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*))
          }
          val minCols = (0 until 16).map(k => min(col(s"h$k")).as(s"m$k"))
          val hashCols = (0 until 16).map(k =>
            md5(concat_ws("#", col("shingle"), lit(k))).as(s"h$k"))
          time(s"[$r] sig: window-shingles + project-md5 + agg(min)") {
            noop(docs.ngramShingles("doc_id", "text", 3)
              .select(col("doc_id") +: hashCols: _*)
              .groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*))
          }
          time(s"[$r] sig: array-shingles + agg(min md5 x16)") {
            noop(arrShingles.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*))
          }
          time(s"[$r] sig: distinct-shingle hash + join + agg(min)") {
            val sh = arrShingles
            val hs = sh.select(col("shingle")).distinct()
              .select(col("shingle") +: hashCols: _*)
            noop(sh.join(hs, "shingle")
              .groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*))
          }
        }
      case "persist" =>
        import graft.Graft._
        val mins = (0 until 16).map(k =>
          min(md5(concat_ws("#", col("shingle"), lit(k)))).as(s"m$k"))
        def sig = docs.ngramShingles("doc_id", "text", 3)
          .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
          .select(col("doc_id"),
            array((0 until 16).map(k => col(s"m$k")): _*).as("sig"))
        (1 to 3).foreach { r =>
          time(s"[$r] sig plain count")(sig.count())
          time(s"[$r] sig plain noop")(noop(sig))
          val p = sig.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
          time(s"[$r] sig DISK_ONLY persist + count")(p.count())
          time(s"[$r] re-count cached")(p.count())
          p.unpersist(blocking = true)
          val m = sig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          time(s"[$r] sig MEMORY_AND_DISK persist + count")(m.count())
          m.unpersist(blocking = true)
          time(s"[$r] sig localCheckpoint(eager)")(sig.localCheckpoint(true))
          spark.catalog.clearCache()
        }
      case "sh2" =>
        import graft.Graft._
        (1 to 2).foreach { r =>
          time(s"[$r] NEW ngramShingles noop")(
            noop(docs.ngramShingles("doc_id", "text", 3)))
        }
        docs.ngramShingles("doc_id", "text", 3).explain("formatted")
        (1 to 2).foreach { r =>
          time(s"[$r] NEW ngramJaccardPairs noop")(
            noop(docs.ngramJaccardPairs("doc_id", "text", 3, 0.2, 100)))
          spark.catalog.clearCache()
        }
      case "sh3" =>
        val ws = split(trim(lower(col("text"))), "\\s+")
        def shArr(src: DataFrame) = src
          .select(col("doc_id"), ws.as("_ws"))
          .select(col("doc_id"),
            when(size(col("_ws")) >= 3,
              transform(sequence(lit(0), size(col("_ws")) - 3), i =>
                concat_ws(" ", element_at(col("_ws"), i + 1),
                  element_at(col("_ws"), i + 2), element_at(col("_ws"), i + 3))))
              .otherwise(array().cast("array<string>")).as("_sh"))
        (1 to 2).foreach { r =>
          time(s"[$r] A transform only + explode")(
            noop(shArr(docs).select(col("doc_id"), explode(col("_sh")).as("shingle"))))
          time(s"[$r] B + array_distinct")(
            noop(shArr(docs).select(col("doc_id"),
              explode(array_distinct(col("_sh"))).as("shingle"))))
          time(s"[$r] C + fanOut no distinct")(
            noop(shArr(docs.repartition(32, col("doc_id")))
              .select(col("doc_id"), explode(col("_sh")).as("shingle"))))
          time(s"[$r] D + fanOut + array_distinct")(
            noop(shArr(docs.repartition(32, col("doc_id")))
              .select(col("doc_id"), explode(array_distinct(col("_sh"))).as("shingle"))))
          time(s"[$r] E + fanOut + global distinct")(
            noop(shArr(docs.repartition(32, col("doc_id")))
              .select(col("doc_id"), explode(col("_sh")).as("shingle")).distinct()))
        }
      case "sh4" =>
        val ws = split(trim(lower(col("text"))), "\\s+")
        def base = docs.select(col("doc_id"), ws.as("_ws"))
        val tr = transform(sequence(lit(0), size(col("_ws")) - 3), i =>
          concat_ws(" ", element_at(col("_ws"), i + 1),
            element_at(col("_ws"), i + 2), element_at(col("_ws"), i + 3)))
        val guarded = when(size(col("_ws")) >= 3, tr)
          .otherwise(array().cast("array<string>"))
        (1 to 2).foreach { r =>
          time(s"[$r] explode(transform) no when")(
            noop(base.filter(size(col("_ws")) >= 3)
              .select(col("doc_id"), explode(tr).as("s"))))
          time(s"[$r] explode(when(transform))")(
            noop(base.select(col("doc_id"), explode(guarded).as("s"))))
          time(s"[$r] explode(attr) via extra select+filter barrier")(
            noop(base.select(col("doc_id"), guarded.as("_sh"))
              .filter(size(col("_sh")) >= 0)
              .select(col("doc_id"), explode(col("_sh")).as("s"))))
          time(s"[$r] explode(split) raw")(
            noop(base.select(col("doc_id"), explode(col("_ws")).as("s"))))
          time(s"[$r] transform into array col then separate explode via cache-free localLimit barrier")(
            noop(base.select(col("doc_id"), guarded.as("_sh"))
              .select(col("doc_id"), size(col("_sh")).as("_n"), explode(col("_sh")).as("s"))))
        }
      case "sh5" =>
        val ws = split(trim(lower(col("text"))), "\\s+")
        val tr = transform(sequence(lit(0), size(col("_ws")) - 3), i =>
          concat_ws(" ", element_at(col("_ws"), i + 1),
            element_at(col("_ws"), i + 2), element_at(col("_ws"), i + 3)))
        val guarded = array_distinct(when(size(col("_ws")) >= 3, tr)
          .otherwise(array().cast("array<string>")))
        def base = docs.repartition(32, col("doc_id"))
          .select(col("doc_id"), ws.as("_ws"))
        (1 to 2).foreach { r =>
          time(s"[$r] A barrier: arr -> repartition -> size+explode(attr)") {
            noop(docs.select(col("doc_id"), ws.as("_ws"))
              .select(col("doc_id"), guarded.as("_sh"))
              .repartition(32, col("doc_id"))
              .select(col("doc_id"), size(col("_sh")).as("_n"),
                explode(col("_sh")).as("shingle")))
          }
          time(s"[$r] B inline explode + separate map-only sizes (count both)") {
            noop(base.select(col("doc_id"), explode(guarded).as("shingle")))
            noop(docs.select(col("doc_id"), size(guarded).as("_n")))
          }
          time(s"[$r] C inline posexplode struct(n inside? no) just explode") {
            noop(base.select(col("doc_id"), explode(guarded).as("shingle")))
          }
        }
      case "q48" =>
        val cust0 = spark.read.parquet(s"$sfDir/customer.parquet")
        val latAxis = spark.read.parquet(s"$sfDir/supplier.parquet")
          .select((col("s_suppkey").cast("double") * 1.6 - 80.0).as("g_lat")).distinct()
        val lonAxis = spark.read.parquet(s"$sfDir/part.parquet")
          .select(((col("p_partkey") % 180).cast("double") * 2.0 - 180.0).as("g_lon")).distinct()
        val cust = graft.Graft.fanOut(cust0, col("c_custkey")).select(
          col("c_custkey"),
          (pmod(col("c_custkey").cast("double") * 17.0, lit(160.0)) - 80.0).as("c_lat"),
          (pmod(col("c_custkey").cast("double") * 53.0, lit(360.0)) - 180.0).as("c_lon"))
        (1 to 3).foreach { r =>
          time(s"[$r] q48 current (2-pass x2 axes)")(
            noop(graft.operators.ToleranceOps.all("q48_quick_nn")(spark, sfDir)))
          spark.catalog.clearCache()
          time(s"[$r] q48 min-struct (1-pass x2 axes)") {
            val bl = cust.crossJoin(broadcast(latAxis))
              .groupBy(col("c_custkey"))
              .agg(min(struct(abs(col("c_lat") - col("g_lat")).as("d"), col("g_lat"))).as("_b"))
              .select(col("c_custkey"), col("_b.g_lat").as("g_lat"))
            val bo = cust.crossJoin(broadcast(lonAxis))
              .groupBy(col("c_custkey"))
              .agg(min(struct(abs(col("c_lon") - col("g_lon")).as("d"), col("g_lon"))).as("_b"))
              .select(col("c_custkey"), col("_b.g_lon").as("g_lon"))
            noop(cust.join(bl, "c_custkey").join(bo, "c_custkey")
              .select(col("c_custkey"), col("g_lat"), col("g_lon"),
                round(graft.functions.ColumnFns.haversineKm(
                  col("c_lat"), col("c_lon"), col("g_lat"), col("g_lon")), 4).as("dist_km")))
          }
        }
      case "q52asg" =>
        // A/B: the two-pass max-cosine/min-cid centroid assignment vs a
        // single-pass max(struct(cos, -cid)) over the same n x K
        // product (the q48 question re-asked for the IVF assignment:
        // does one SortAggregate product pass beat two hash-agg product
        // passes + the extra e-join, now that fanOut parallelizes the
        // product stage?)
        val e = graft.Graft.fanOut(
          spark.read.parquet(s"$sfDir/embeddings.parquet"), col("vec_id"))
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val seeds = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        import graft.functions.CosineSimilarity
        (1 to 3).foreach { r =>
          time(s"[$r] assign two-pass (current)") {
            val prod = e.crossJoin(broadcast(seeds))
              .withColumn("_cos", CosineSimilarity(col("v"), col("cv")))
            val best = prod.groupBy(col("vec_id")).agg(max(col("_cos")).as("_bc"))
            val cids = e.join(best, "vec_id")
              .crossJoin(broadcast(seeds))
              .filter(CosineSimilarity(col("v"), col("cv")) === col("_bc"))
              .groupBy(col("vec_id")).agg(min(col("cid")).as("cid"))
            noop(e.join(cids, "vec_id").select(col("vec_id"), col("cid"), col("v")))
          }
          time(s"[$r] assign min-struct (1 product pass)") {
            val cids = e.crossJoin(broadcast(seeds))
              .groupBy(col("vec_id"))
              .agg(max(struct(
                CosineSimilarity(col("v"), col("cv")).as("_c"),
                (-col("cid")).as("_nc"))).as("_b"))
              .select(col("vec_id"), (-col("_b._nc")).as("cid"))
            noop(e.join(cids, "vec_id").select(col("vec_id"), col("cid"), col("v")))
          }
        }
      case "q48u" =>
        // A/B: current q48 (two axis products, two aggs, 3-way SMJ
        // join-back) vs a fused tagged-union product (ONE broadcast
        // product, ONE agg pass with two conditional min(struct)
        // buffers, grouped by the full customer tuple so nothing needs
        // joining back)
        val latAxis = spark.read.parquet(s"$sfDir/supplier.parquet")
          .select((col("s_suppkey").cast("double") * 1.6 - 80.0).as("g_lat")).distinct()
        val lonAxis = spark.read.parquet(s"$sfDir/part.parquet")
          .select(((col("p_partkey") % 180).cast("double") * 2.0 - 180.0).as("g_lon")).distinct()
        val cust = graft.Graft.fanOut(
          spark.read.parquet(s"$sfDir/customer.parquet"), col("c_custkey")).select(
          col("c_custkey"),
          (pmod(col("c_custkey").cast("double") * 17.0, lit(160.0)) - 80.0).as("c_lat"),
          (pmod(col("c_custkey").cast("double") * 53.0, lit(360.0)) - 180.0).as("c_lon"))
        val hav = graft.functions.ColumnFns.haversineKm _
        (1 to 3).foreach { r =>
          time(s"[$r] q48 current (2 products + join-back)")(
            noop(graft.operators.ToleranceOps.all("q48_quick_nn")(spark, sfDir)))
          time(s"[$r] q48 fused union product (1 pass, no joins)") {
            val axes = latAxis.select(lit(0L).as("_ax"), col("g_lat").as("_g"))
              .unionByName(lonAxis.select(lit(1L).as("_ax"), col("g_lon").as("_g")))
            noop(cust.crossJoin(broadcast(axes))
              .groupBy(col("c_custkey"), col("c_lat"), col("c_lon"))
              .agg(
                min(when(col("_ax") === 0, struct(
                  abs(col("c_lat") - col("_g")).as("_d"), col("_g").as("g_lat")))).as("_bl"),
                min(when(col("_ax") === 1, struct(
                  abs(col("c_lon") - col("_g")).as("_d"), col("_g").as("g_lon")))).as("_bo"))
              .select(col("c_custkey"), col("_bl.g_lat").as("g_lat"),
                col("_bo.g_lon").as("g_lon"),
                round(hav(col("c_lat"), col("c_lon"), col("_bl.g_lat"),
                  col("_bo.g_lon")), 4).as("dist_km")))
          }
        }
      case "q47u" =>
        // A/B: current q47 (inner banded join -> agg -> LEFT join-back
        // to retain unmatched probes) vs a LEFT banded join with the
        // delta residual moved into a conditional min(struct) — the
        // join-back and its exchanges vanish; unmatched probes ride the
        // null-extended rows into the same aggregate
        val deltaUs = 7200L * 1000000L
        val probes0 = spark.read.parquet(s"$sfDir/events.parquet")
          .select(col("user_id")).distinct()
          .select(col("user_id"), explode(expr(
            "sequence(TIMESTAMP_NTZ '2024-01-02 00:00:00', TIMESTAMP_NTZ '2024-01-30 00:00:00', INTERVAL 6 HOURS)"))
            .as("probe_ts"))
          .withColumn("_pus", unix_micros(col("probe_ts").cast("timestamp")))
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
          .select(col("user_id"), col("ts"), col("value"), col("event_id"))
          .withColumn("_eus", unix_micros(col("ts").cast("timestamp")))
        def bin47(c: org.apache.spark.sql.Column) =
          floor(c / lit(deltaUs.toDouble)).cast("long")
        (1 to 3).foreach { r =>
          time(s"[$r] q47 current (inner banded + join-back)")(
            noop(graft.operators.ToleranceOps.all("q47_interp_nearest")(spark, sfDir)))
          time(s"[$r] q47 left banded + conditional agg (no join-back)") {
            val l = probes0.withColumn("_tbin", explode(array(
              bin47(col("_pus")) - 1, bin47(col("_pus")), bin47(col("_pus")) + 1)))
            val rr = ev.withColumn("_tbin", bin47(col("_eus")))
            noop(l.join(rr, Seq("user_id", "_tbin"), "left")
              .groupBy(col("user_id"), col("probe_ts"))
              .agg(min(when(abs(col("_eus") - col("_pus")) <= lit(deltaUs.toDouble),
                struct(abs(col("_eus") - col("_pus")).as("_ad"),
                  col("ts"), col("event_id"), col("value")))).as("_b"))
              .select(col("user_id"), col("probe_ts"),
                round(col("_b.value"), 6).as("near_value"),
                when(col("_b").isNotNull, lit(1)).otherwise(lit(0)).as("matched")))
          }
        }
      case "md5" =>
        // raw md5 throughput: 4.2M short-string md5s in a projection
        (1 to 3).foreach { r =>
          time(s"[$r] 4.2M md5 in projection") {
            noop(spark.range(4200000).select(
              md5(concat_ws("#", col("id").cast("string"), lit("x")))))
          }
        }
      case "q26parts" =>
        import graft.Graft._
        val mins = (0 until 16).map(k =>
          min(md5(concat_ws("#", col("shingle"), lit(k)))).as(s"m$k"))
        (1 to 2).foreach { r =>
          val sig = Materialize(docs.ngramShingles("doc_id", "text", 3)
            .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
            .select(col("doc_id"),
              array((0 until 16).map(k => col(s"m$k")): _*).as("sig")))
          time(s"[$r] sig materialize (count)")(sig.count())
          val rowsPerBand = 4
          val banded = sig.select(col("doc_id"), col("sig"),
            posexplode(transform(sequence(lit(0), lit(3)), bnd =>
              md5(concat_ws("|", slice(col("sig"), bnd * rowsPerBand + 1, lit(rowsPerBand)))))))
            .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
          val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
          val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
          val candidates = a.join(b, Seq("band", "bucket"))
            .filter(col("doc_a") < col("doc_b"))
            .select(col("doc_a"), col("doc_b")).distinct()
          time(s"[$r] banding + candidates")(noop(candidates))
          time(s"[$r] full rest (joins + est_sim)") {
            noop(candidates
              .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
              .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
              .withColumn("est_sim",
                round(aggregate(zip_with(col("sig_a"), col("sig_b"),
                  (x, y) => when(x === y, 1).otherwise(0)),
                  lit(0), (acc, v) => acc + v).cast("double") / 16.0, 4))
              .filter(col("est_sim") >= 0.25))
          }
          spark.catalog.clearCache()
        }
      case other => println(s"unknown lab mode $other")
    }
    spark.stop()
  }
}
