package graft.frontier

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

import graft.model.Candidate
import graft.data.SyntheticCorpus
import graft.jobs.CrawlJob
import graft.store.ParquetSnapshotStore

/** Seen-set semantics under the LSM shape: delta segments, multi-segment
  * reads, major compaction, and the bucket-count-adaptive pruning path. */
class SeenSetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("seenset-spec")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  private def cands(urls: Seq[String]): org.apache.spark.sql.Dataset[Candidate] = {
    import spark.implicits._
    spark.createDataset(urls.map(u => Candidate(u, "h", 1.0, 0, 0)))
  }

  private def urlsOf(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"https://host${i % 7}.example/$tag/$i")

  test("multi-segment blooms: no false negatives, dedup result bucket-count invariant") {
    import spark.implicits._
    val seenUrls = urlsOf(300, "seen")
    val freshUrls = urlsOf(200, "fresh")
    for (numBuckets <- Seq(8, 128)) {
      val cfg = SeenSet.Config(numBuckets = numBuckets, expectedPerBucket = 1 << 12)
      // seen set written as THREE delta segments (LSM read path)
      val seg = seenUrls.grouped(100).toVector
      val blooms = seg.map(g => SeenSet.buildDeltaBlooms(spark, spark.createDataset(g), cfg))
        .reduce(_ unionByName _)
      val seen = spark.createDataset(seenUrls)
        .map(u => (u, SeenSet.bucketOfUrl(u, cfg.numBuckets))).toDF("url", "bucket")
      val out = SeenSet.dedupAndFilterNew(spark,
        cands(seenUrls.take(50) ++ freshUrls ++ freshUrls.take(30) /* in-batch dupes */),
        seen, blooms, cfg).collect().map(_.url).toSet
      assert(out == freshUrls.toSet,
        s"numBuckets=$numBuckets: seen urls must be filtered, fresh kept exactly once")
    }
  }

  test("delta blooms are small, sized to actual inserts") {
    import spark.implicits._
    val cfg = SeenSet.Config(numBuckets = 4, expectedPerBucket = 1 << 20)
    val delta = SeenSet.buildDeltaBlooms(spark, spark.createDataset(urlsOf(40, "d")), cfg).collect()
    val full = SeenSet.buildBlooms(spark, spark.createDataset(urlsOf(40, "d")), cfg).collect()
    val deltaBytes = delta.map(_.bytes.length).sum
    val fullBytes = full.map(_.bytes.length).sum
    assert(deltaBytes * 100 < fullBytes,
      s"a 40-url delta ($deltaBytes B) must be far smaller than full-capacity filters ($fullBytes B)")
  }

  test("major compaction: segment count stays bounded across many epochs, crawl exact") {
    import org.apache.spark.sql.functions.col
    val cfg = CrawlJob.Config(
      seen = SeenSet.Config(numBuckets = 8, expectedPerBucket = 1 << 14, maxBloomSegments = 3),
      sched = Scheduler.Config(perHostBudget = 3, saltFactor = 4))
    val store = new ParquetSnapshotStore(Files.createTempDirectory("seenlsm").toString)
    val pages = CrawlJob.preparePages(SyntheticCorpus.pages(spark, 11L, 120L, 4).toDF())
    val robots = SyntheticCorpus.robots(spark, 11L).toDF()
    CrawlJob.init(spark, store, SyntheticCorpus.seeds(spark, 11L, 120L, 6), cfg)
    val results = CrawlJob.run(spark, store, pages, robots, cfg, maxEpochs = 40)
    assert(results.last.frontierSize == 0, "must drain")
    assert(results.length > cfg.seen.maxBloomSegments, "fixture must run enough epochs to compact")
    val snap = store.latest().get
    assert(snap.tables("blooms").split(";").length <= cfg.seen.maxBloomSegments,
      "bloom segment list must stay bounded by maxBloomSegments")
    // correctness across compactions: no url ever scheduled twice
    import spark.implicits._
    val urls = (0L to snap.epoch).flatMap { e =>
      val path = snap.tables("scheduled").replaceAll("v\\d+$", s"v$e")
      spark.read.parquet(path).select("url").as[String].collect()
    }
    assert(urls.distinct.size == urls.size, "a url was scheduled twice across compactions")
  }

  test("allowedPath matches RobotsRules.allowed") {
    val dis = Vector("/private", "/tmp", "/a/b")
    val alw = Vector("/private/ok", "/a")
    val rules = RobotsRules(dis, alw, None)
    for (p <- Seq("/", "/private", "/private/ok/x", "/a/b/c", "/a/c", "/tmp/x", "", "/x"))
      assert(RobotsRules.allowedPath(dis, alw, p) == rules.allowed(p), s"path $p")
  }
}
