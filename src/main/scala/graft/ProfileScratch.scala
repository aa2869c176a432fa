package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the optimization round — times labelled
  * sub-stages of composite queries so the OPTIMIZATION_r19.md "what I
  * measured" sections rest on numbers, not guesses. Not part of the
  * driver contract.
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark, sfDir, SparkEntry.stagers) // staged, no warmup? stagers only
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label ${(System.nanoTime()-t0)/1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val which = args.headOption.getOrElse("census")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    (1 to reps).foreach { rep =>
      System.err.println(s"[profile] === rep $rep ===")
      which match {
        case "census" =>
          val s = spark; val d = sfDir
          graft.plans.GraftExtensions.register(s)
          val raw = time("raw load")(Tables(s, d, "documents"))
          val surv = time("surv checkpoint")(
            raw.groupBy("text").agg(min("doc_id").as("doc_id"))
              .localCheckpoint(true))
          val docsG = time("docsG checkpoint")(
            graft.queries.TextOps.mhShingledRead(s, d)
              .join(surv.select("doc_id"), "doc_id")
              .localCheckpoint(true))
          val survIds = surv.select("doc_id")
          val (p0, f0) = graft.queries.TextOps.prefixSidesStaged(s, d,
            la => floor(la / lit(3)).cast("int") + lit(1))
          val cand = graft.queries.TextOps.candidateJoin(
            p0.join(survIds.withColumnRenamed("doc_id", "pa"),
              Seq("pa"), "left_semi"),
            f0.join(survIds.withColumnRenamed("doc_id", "fb"),
              Seq("fb"), "left_semi"),
            Some(2))
          val ga = docsG.select(col("doc_id").as("da"), col("g").as("ga"))
          val gb = docsG.select(col("doc_id").as("db"), col("g").as("gb"))
          val pairs = cand.join(ga, "da").join(gb, "db")
            .select(col("da"), col("db"),
              call_function("graft_jaccard_sorted", col("ga"), col("gb"))
                .as("j"))
            .filter(col("j") >= 0.5)
          time("cand+verify noop")(noop(pairs))
          val cc = time("CC")(graft.operators.ConnectedComponents(
            pairs.select(col("da").as("src"), col("db").as("dst"))))
          val near = surv
            .join(cc.select(col("v").as("doc_id"), col("comp")),
              Seq("doc_id"), "left")
            .filter(coalesce(col("comp"), col("doc_id")) === col("doc_id"))
          time("final aggs")(noop(
            raw.agg(count(lit(1)).as("n_raw"))
              .crossJoin(surv.agg(count(lit(1)).as("n_exact")))
              .crossJoin(near.agg(
                count(lit(1)).as("n_near"),
                sum(when(size(split(lower(col("text")), " ")) >= 40, 1L)
                  .otherwise(0L)).as("n_final")))))
        case "phonetic_cells" =>
          // dump the confusion cells of er_fs_classify_phonetic at this
          // SF to find zero precision denominators (tp+fp) per scheme
          val (p1, p2, p3) = graft.queries.EntityRes.passesP(spark, sfDir)
          val mp = p1.unionByName(p2).unionByName(p3)
          val hist = mp.groupBy("in_nat", "in_p2", "is_match",
            "ag_name", "ag_seg", "ag_band").agg(count(lit(1)).as("n"))
          hist.orderBy("in_nat", "in_p2", "is_match", "ag_name",
            "ag_seg", "ag_band").show(70, truncate = false)
        case "audiobench" =>
          // driver-side codec loop: is AudioSystem's per-call SPI lookup
          // the multimodal_audio_features cost, or is it the plan?
          val pcm = Array.fill[Byte](600)(65)
          time("5000x encode+decode") {
            var i = 0
            while (i < 5000) {
              val fmt = new javax.sound.sampled.AudioFormat(
                javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
                8000f, 8, 1, 1, 8000f, false)
              val src = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
              val baos = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(src,
                javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
              src.close()
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(baos.toByteArray))
              val n = in.readAllBytes().length
              in.close()
              i += 1
            }
          }
        case "audio_stages" =>
          import spark.implicits._
          val base = Tables(spark, sfDir, "documents")
            .repartition(spark.sparkContext.defaultParallelism)
            .select(col("doc_id"),
              (lit(8000) + (col("doc_id") % 4).cast("int") * 4000)
                .as("rate"),
              col("text").cast("binary").as("pcm"))
          time("scan+repartition only")(noop(base))
          val wav = base.as[(Long, Int, Array[Byte])]
            .mapPartitions { it =>
              it.map { case (id, rate, pcm) =>
                val fmt = new javax.sound.sampled.AudioFormat(
                  javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
                  rate.toFloat, 8, 1, 1, rate.toFloat, false)
                val src = new javax.sound.sampled.AudioInputStream(
                  new java.io.ByteArrayInputStream(pcm), fmt,
                  pcm.length.toLong)
                val baos = new java.io.ByteArrayOutputStream()
                javax.sound.sampled.AudioSystem.write(src,
                  javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
                src.close()
                (id, baos.toByteArray)
              }
            }.toDF("doc_id", "wav")
          time("encode stage")(noop(wav))
          time("whole key")(noop(
            SparkEntry.queries("multimodal_audio_features")(spark, sfDir)))
          time("whole key no orderBy")(noop(
            SparkEntry.queries("multimodal_audio_features")(spark, sfDir)
              .sortWithinPartitions("doc_id")))
        case "pct" =>
          // agg_percentile_exact attribution: is the cost the near-unique
          // price percentile's map state, or the scan/qty side?
          val li = Tables(spark, sfDir, "lineitem")
          time("scan only")(noop(li.select("l_returnflag", "l_quantity",
            "l_extendedprice")))
          time("qty percentile only")(noop(li.groupBy("l_returnflag")
            .agg(expr("percentile(l_quantity, 0.5)").as("m"))))
          time("price percentile only")(noop(li.groupBy("l_returnflag")
            .agg(expr("percentile(l_extendedprice, 0.9)").as("p"))))
          time("whole key")(noop(
            SparkEntry.queries("agg_percentile_exact")(spark, sfDir)))
        case "er_golden" =>
          val s = spark; val d = sfDir
          val er = graft.queries.EntityRes
          val dd = er.dirty(s, d)
          val pid = er.flaggedPairs(dd, dd)
          time("pair stream noop")(noop(pid))
          val edges = er.mergeEdges(s, d, pid)
          time("edges noop")(noop(edges))
          val cc = time("CC")(graft.operators.ConnectedComponents(edges))
          val rank = length(col("name")).cast("long") *
            lit(10000000000000L) - col("id")
          time("final agg")(noop(
            dd.join(cc, dd("id") === cc("v"), "left")
              .groupBy(coalesce(col("comp"), dd("id")).as("entity_id"))
              .agg(count(lit(1)).as("n_records"),
                max_by(col("name"), rank).as("surv_name"),
                max_by(col("seg"), rank).as("surv_seg"),
                max_by(col("band"), rank).as("surv_band"),
                (countDistinct("seg") > 1).cast("long").as("seg_conflict"),
                (countDistinct("band") > 1).cast("long").as("band_conflict"))
              .orderBy("entity_id")))
        case "jobs" =>
          // generic job-structure probe: how many Spark jobs does a key
          // launch, and where does the wall clock go between them?
          val key = args.lift(2).getOrElse("dedup_incremental_index")
          val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.put(j.jobId, j.time)
            override def onJobEnd(
                j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
              done.put(j.jobId, j.time)
          }
          spark.sparkContext.addSparkListener(listener)
          jobs.clear(); done.clear()
          time(s"whole $key")(noop(SparkEntry.queries(key)(spark, sfDir)))
          spark.sparkContext.removeSparkListener(listener)
          Thread.sleep(300)
          import scala.jdk.CollectionConverters._
          val rows = jobs.asScala.toSeq.sortBy(_._1)
          val t00 = rows.headOption.map(_._2).getOrElse(0L)
          rows.foreach { case (id, st) =>
            val en = done.getOrDefault(id, st)
            System.err.println(f"[profile] job $id%3d start+${(st - t00) / 1e3}%7.2f s dur ${(en - st) / 1e3}%6.2f s")
          }
          System.err.println(s"[profile] total jobs: ${rows.size}")
        case k =>
          time(s"whole $k")(
            noop(SparkEntry.queries(k)(spark, sfDir)))
      }
    }
    spark.stop()
  }
}
