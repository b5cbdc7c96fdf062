package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the optimization rounds (guide §1) — SEPARATE
  * from the frozen graft.Bench contract. Modes (first arg):
  *
  *   plans <outDir> <suffix>   write .explain("formatted") for every
  *                             parquet-backed declared query to
  *                             <outDir>/<name>_<suffix>.txt
  *   noop [nameFilter...]      time each declared query with the noop sink
  *                             (computation only, no collect/driver cost),
  *                             best-of-3, print one JSON line
  *   crawl                     run the bench-shaped 3-epoch crawl once with
  *                             GRAFT_EPOCH_TIMING honored (set the env var
  *                             to see per-phase breakdown)
  *
  * Uses the same session config as graft.Bench so timings are comparable.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 32 * 1024 * 1024)
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "snappy"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // non-relational / side-effecting queries that run whole jobs inside
    // the query builder (streaming, mini-crawls, fs sinks) — excluded from
    // plan dumps and noop timing (the frozen bench times them end-to-end)
    val sideEffecting = Set("crawl_schedule", "crawl_schedule_cuckoo",
      "stream_ingest", "stream_host_gate", "extract_sink_manifest")

    args.headOption.getOrElse("noop") match {
      case "plans" =>
        val outDir = args(1)
        val suffix = if (args.length > 2) args(2) else "before"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !sideEffecting(name)) {
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              plan.getBytes("UTF-8"))
            System.err.println(s"[plans] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[plans] $name failed: ${e.getMessage}")
          }
        }

      case "noop" =>
        val filter = args.drop(1).toSet
        // warm pass over the tables like the frozen bench does
        for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                      "lineitem", "events", "documents", "embeddings"))
          try spark.read.parquet(s"$sfDir/$t.parquet").count()
          catch { case _: Throwable => () }
        val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
             if !sideEffecting(name) && (filter.isEmpty || filter(name))) {
          spark.sparkContext.setJobDescription(s"noop: $name")
          def one(): Double = time {
            try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              System.err.println(s"[noop] $name failed: ${e.getMessage}") }
          }
          val sec = (1 to 3).map(_ => one()).min
          results(name) = sec
          System.err.println(f"[noop] $name $sec%.3f")
        }
        val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString("{", ",", "}")
        println(s"""{"metric":"noop","queries":$qs,"sf":"$sfDir","cpus":$cpus}""")

      case "crawlplans" =>
        // dump the crawl epoch's two restructured subplans (seen-filter
        // output, politeness dequeue) for the plans/r06 before/after
        // evidence — uses only APIs stable across the r5/r6 boundary
        val outDir = args(1)
        val suffix = if (args.length > 2) args(2) else "before"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        import graft.jobs.CrawlJob
        import graft.frontier.{SeenSet, Scheduler}
        import graft.model.Candidate
        import spark.implicits._
        import org.apache.spark.sql.functions.{broadcast, coalesce, array, struct, udf}
        val cfg = CrawlJob.Config(
          seen = SeenSet.Config(numBuckets = 32, expectedPerBucket = 1 << 18),
          sched = Scheduler.Config(perHostBudget = 256, saltFactor = 8),
          shufflePartitions = cpus)
        val pages = CrawlJob.preparePages(
          graft.data.SyntheticCorpus.pages(spark, 42L, 20000L, cpus, 300).toDF())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pages.count()
        val robots = graft.data.SyntheticCorpus.robots(spark, 42L, 300).toDF()
        val root = java.nio.file.Files.createTempDirectory("planx-crawl").toString
        val store = new graft.store.ParquetSnapshotStore(root)
        CrawlJob.init(spark, store,
          graft.data.SyntheticCorpus.seeds(spark, 42L, 20000L, 1000, 300), cfg)
        CrawlJob.runEpoch(spark, store, pages, robots, cfg)
        CrawlJob.runEpoch(spark, store, pages, robots, cfg)
        val snap = store.latest().get
        val frontier = store.readTable(spark, snap, "frontier").as[Candidate]
        val seen = store.readTable(spark, snap, "seen")
        val blooms = store.readTable(spark, snap, "blooms").as[SeenSet.BucketBloom]
        val (kept, _, _) = SeenSet.dedupAndFilterNew(spark, frontier, seen, blooms, cfg.seen)
        def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
        dump("crawl_epoch_seenfilter", kept.toDF())
        val budgeted = kept.toDF()
          .select(struct($"url", $"host", $"priority", $"discoveredEpoch",
                         $"retries").as("_1"),
                  org.apache.spark.sql.functions.lit(cfg.sched.perHostBudget).as("_2"))
          .as[(Candidate, Int)]
        dump("crawl_epoch_dequeue", Scheduler.dequeueRanked(spark, budgeted, cfg.sched).toDF())
        System.err.println(s"[crawlplans] wrote $suffix")

      case "hotplans" =>
        // bench-shaped natural-fire hot dedup corpora (smaller n, same
        // branch selection) — plan evidence for the r6 tier branching
        val outDir = args(1)
        val suffix = if (args.length > 2) args(2) else "before"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
        val docs = graft.data.SyntheticCorpus.hotDocs(spark, 42L, 20000L, 6000L, cpus)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        docs.count()
        dump("dedup_hot_simhash", graft.pipeline.Dedup.simhashNearDups(docs, "doc_id", "text"))
        val emb = graft.data.SyntheticCorpus.hotEmbeddings(spark, 42L, 30000L, 64, 50, cpus)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        emb.count()
        dump("dedup_hot_embedding",
          graft.pipeline.Dedup.embeddingNearDups(emb, "vec_id", "embedding", threshold = 0.99))
        System.err.println(s"[hotplans] wrote $suffix")

      case "crawl" =>
        import graft.jobs.CrawlJob
        import graft.frontier.{SeenSet, Scheduler}
        val crawlPages = sys.env.getOrElse("SPARK_GRAFT_CRAWL_PAGES", "200000").toLong
        val crawlHosts = sys.env.getOrElse("SPARK_GRAFT_CRAWL_HOSTS", "1200").toInt
        val crawlSeeds = sys.env.getOrElse("SPARK_GRAFT_CRAWL_SEEDS", "10000").toInt
        val nBuckets = sys.env.getOrElse("SPARK_GRAFT_CRAWL_BUCKETS", "32").toInt
        val cfg = CrawlJob.Config(
          seen = SeenSet.Config(numBuckets = nBuckets, expectedPerBucket = 1 << 18),
          sched = Scheduler.Config(perHostBudget = 256, saltFactor = 8),
          shufflePartitions = cpus)
        val pages = CrawlJob.preparePages(
          graft.data.SyntheticCorpus.pages(spark, 42L, crawlPages, cpus, crawlHosts).toDF())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pages.count()
        val robots = graft.data.SyntheticCorpus.robots(spark, 42L, crawlHosts).toDF()
        val reps = sys.env.getOrElse("SPARK_GRAFT_CRAWL_REPS", "2").toInt
        val secs = (1 to reps).map { _ =>
          val root = java.nio.file.Files.createTempDirectory("benchx-crawl").toString
          val store = new graft.store.ParquetSnapshotStore(root)
          val sec = time {
            CrawlJob.init(spark, store,
              graft.data.SyntheticCorpus.seeds(spark, 42L, crawlPages, crawlSeeds, crawlHosts), cfg)
            (1 to 3).foreach(_ => CrawlJob.runEpoch(spark, store, pages, robots, cfg))
          }
          System.gc()
          System.err.println(f"[crawl] 3 epochs $sec%.3f s")
          sec
        }
        println(f"""{"metric":"crawl_3epochs","value":${secs.min}%.3f,"pages":$crawlPages,"cpus":$cpus}""")

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
